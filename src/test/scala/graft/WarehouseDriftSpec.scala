package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** End-to-end physical-schema drift safety net — the r10 lesson
  * (events.ts changed physical type under unchanged code and six gates
  * vanished at ANALYSIS time) generalized beyond the two columns that
  * already have dedicated adapters (events.ts: TsAdapterSpec;
  * embeddings element type: VecAdapterSpec). A driver round can
  * regenerate ANY table with narrower integer ids (int64 → int32) the
  * way pandas/pyarrow naturally emit them; every query must keep
  * planning and executing against that warehouse — Spark widens
  * int32 in arithmetic and joins, so the failure mode to guard is a
  * hard-coded physical-type assumption (a cast-free getLong, a
  * type-keyed expression), which dies loudly here instead of in six
  * driver gates.
  *
  * Values are NOT compared against the float warehouse — a drifted
  * warehouse legitimately changes value precision; the contract is
  * "plans build, jobs run, rows come back". */
class WarehouseDriftSpec extends SparkSpec {

  /** The sf0.001 warehouse re-written with every BIGINT column narrowed
    * to INT (ids, counts — everything pandas would emit as int32 when
    * the values fit) and the embedding elements widened to double. */
  private lazy val driftDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-drift-wh-").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      var df = spark.read.parquet(s"$sf/$t.parquet")
      df.schema.fields.foreach { f =>
        if (f.dataType == LongType) {
          // premise check: the narrowing must be value-preserving (the
          // drift being modeled is "pandas emitted int32 because the
          // values fit") — a column outside int32 range would silently
          // WRAP under non-ANSI cast and the spec would green-light a
          // garbage warehouse
          val mm = df.agg(min(col(f.name)), max(col(f.name))).head
          val ok = (mm.isNullAt(0) ||
            (mm.getLong(0) >= Int.MinValue && mm.getLong(1) <= Int.MaxValue))
          assert(ok, s"$t.${f.name} exceeds int32 — drift premise broken")
          df = df.withColumn(f.name, col(f.name).cast(IntegerType))
        }
      }
      if (t == "embeddings")
        df = df.withColumn("embedding", col("embedding").cast("array<double>"))
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  /** One representative non-mutating query per family: scans,
    * predicates, joins (hash/broadcast/as-of/interval), aggregation,
    * windows, ordering, set ops, functions, graph, recursion-from-text,
    * dedup (exact, gram, simhash, embedding), text analysis (incl. the
    * unigram LM), sampling, packing, decontamination, ANN (exact + LSH
    * + IVF + PQ + residual), quantization, multimodal metadata. The
    * slow streaming/mutation gates are excluded — they exercise store
    * machinery, not warehouse column types (events ingestion itself is
    * covered by j9/j10/st1/ev1 below). */
  private val slice = Seq(
    "s1_scan_filter", "p3_filter_comparisons", "j1_conjunctive_join",
    "j8_broadcast_join", "j9_asof_join", "j10_interval_join",
    "a2_group_multi_agg", "a6_topk_per_group", "w5_frames_lead_lag",
    "o1_orderby_limit", "u1_union_distinct", "f1_arithmetic",
    "f8_date_functions", "g2_connected_components", "hq21_recursive_rule",
    "st1_tumbling_window", "ev1_sessionization",
    "dd1_exact_dedup", "dd2_ngram_jaccard", "dd4_simhash",
    "dd5_embedding_neardup", "tx1_token_count", "tx8_unigram_logprob",
    "samp1_stratified_sample", "pack1_sequence_packing",
    "dc1_decontamination", "ann1_bruteforce_topk", "ann2_lsh_topk",
    "ann3_ivf_topk", "ann4_pq_adc_topk", "ann7_ivfpq_residual_topk",
    "emb1_quantization", "mm1_media_metadata", "cq2_where_groupby_count",
    // round-11 continuation families: keyless banded range join (exact
    // nano arithmetic over a drifted ts), incremental + min/max MV
    // (BIGINT partials over int32 inputs), z-order layout (quantization
    // over int32 keys), line-level repetition filters, sync LPA
    "j12_banded_range_join", "mv1_incremental_agg",
    "mv4_minmax_insert_only", "adm7_zorder_layout", "tx9_gopher_lines",
    "g8_label_propagation", "tx10_bm25_topk", "ann8_hybrid_rrf",
    "ev2_resample_ffill", "ev3_resample_lerp",
    // round-12 families: grouping sets / pivot over int32 keys, array
    // lambdas over double-drifted embeddings, md5 split + vocab over
    // int32 doc ids, ev4's BIGINT segment products over drifted ts
    "a10_grouping_sets", "a14_pivot", "f11_array_lambdas",
    "samp5_hash_split", "tx11_vocab_topk", "ev4_time_weighted_avg",
    // tokenizer-induction family: dictionary pair counts over int32
    // ids, bigram LM joins, per-dim moments over double-drifted vectors
    "bpe1_pair_counts", "bpe2_second_merge", "tx14_bigram_logprob",
    "emb2_dimension_stats", "cms1_heavy_hitters",
    // round-13 families: corpus line dedup (int32 doc ids through the
    // fp join + reassembly), md5-ranked source quotas, k-core peeling
    // over int32 part/nation keys, k-means over double-drifted
    // embeddings, correlated scalar + null-aware NOT IN through
    // Catalyst's subquery rewrites on int32 keys, event funnels /
    // retention / EWMA / transitions on drifted ts and ids, TF-IDF
    "dd11_line_dedup", "samp6_source_quota", "g9_kcore_peeling",
    "km1_kmeans_assign", "j16_correlated_scalar", "j17_null_aware_anti",
    "ev5_funnel", "ev6_retention", "ev7_ewma_decay",
    "ev8_transition_matrix", "tx15_tfidf_keywords",
    "w9_distribution_windows", "a15_unpivot", "f14_lateral_explode",
    "f13_array_setops", "tx13_edit_distance", "tx12_unicode_normalize")

  test("representative queries plan and execute against an int32/double-drifted warehouse") {
    val failures = slice.flatMap { name =>
      try {
        val n = SparkEntry.queries(name)(spark, driftDir).count()
        if (n > 0) None else Some(s"$name: 0 rows")
      } catch {
        case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${
          Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" ")}")
      }
    }
    assert(failures.isEmpty, s"drifted-warehouse failures:\n${failures.mkString("\n")}")
  }
}
