package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `explain("formatted")` for the headline queries to a markdown
  * file — the plan-level review artifact (every operator's scale story
  * is a plan property: pushdown, broadcast, partial aggregation,
  * WindowGroupLimit, salted exchanges).
  *
  * Usage: runMain graft.PlanDump <sfDir> <outFile>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("PLANS.md")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append("# Physical plans (explain formatted), headline queries\n\n")
    sb.append(s"Generated from `$sfDir` — regenerate with " +
      "`sbt \"runMain graft.PlanDump <sfDir> PLANS.md\"`.\n")
    // headline + the batch-plan-reviewable round-12 additions (the
    // streaming gates' plans live behind a drained memory sink — not
    // meaningful to dump here)
    val extras = Seq("a10_grouping_sets", "a14_pivot", "f11_array_lambdas",
      "samp5_hash_split", "tx11_vocab_topk", "tx12_unicode_normalize",
      "tx13_edit_distance", "f13_array_setops",
      // round-13: line dedup (fp-keyed boilerplate join), md5-ranked
      // quotas (WindowGroupLimit), k-means (K-row broadcast assign),
      // decorrelated scalar subquery, null-aware anti join, TF-IDF
      "dd11_line_dedup", "samp6_source_quota", "km1_kmeans_assign",
      "j16_correlated_scalar", "j17_null_aware_anti",
      "tx15_tfidf_keywords", "w9_distribution_windows",
      // round-13/14 plan-audited gates: window-sum anomaly scan,
      // co-purchase self-join, zero-Exchange chunking, DISTINCT
      // elimination, the shuffle-free bucketed join, islands /
      // attribution windows, null-safe join, token-budget window,
      // and the md5-family LSH gate (the full-oracle twin of dd3)
      "ev9_anomaly_zscore", "g11_copurchase", "tx18_chunking",
      "mv11_distinct_elim", "j15_bucket_colocated_join",
      "ev10_pattern_islands", "ev11_attribution", "j19_nullsafe_join",
      "samp8_token_budget",
      // round-14 batch additions: survival curve (time-bounded join +
      // 14-row window), normalized dedup (one partial-agg exchange),
      // BPE encode (dictionary-join application; training runs at
      // dump time — vocabulary-bounded)
      "ev12_time_to_conversion", "dd13_normalized_dedup", "bpe3_encode",
      // round-15 additions (r14 judge item 6): the bounded KMV sketch
      // (one exchange of ≤k-hash buffers), the LSH keeper decision,
      // and its exact-first layered composition
      "a18_kmv_distinct", "dd14_lsh_quality_keeper",
      "dd14b_layered_lsh_keeper", "a19_theta_sketch_setops",
      "hq25_approx_distinct", "a20_tuple_sketch_sum",
      // round-16: the quantile sample sketch, the fp-keyed layered
      // collapse (no text across the collapse exchange), the tuple
      // sketch through the language, and the sketch-backed MV refresh
      "a21_sketch_quantiles", "dd14c_fp_layered_keeper",
      "hq26_approx_sum_distinct", "mv12_kmv_sketch_view",
      // round-17: the layered incremental dedup (corpus collapsed to
      // representatives before banding), the arbitrary-quantile sketch
      // through the language, the transparently pruned point read
      // (AutoSkip narrows the scan's file roots), and the language
      // IN-list probe over the same banded store
      "dd6c_incremental_layered", "hq28_approx_quantile",
      "adm25_transparent_skipping", "hq29_bloom_in_hql",
      // the segment-tree range count/sum (two-exchange tree build; the
      // aggregate-only twin of j12's pair enumeration)
      "j12b_range_count", "j12c_range_sum",
      // round-18: the layered √n-centroid semantic dedup (exact-value
      // collapse before the cluster-local pair search), the global-
      // value package-instance read, and the segment tree reached from
      // parsed text (range_agg pipeline stage)
      "dd9b_semantic_dedup_scaled", "hq30_global_values",
      "hq31_range_agg_hql", "j12d_range_minmax", "hq32_range_minmax_hql",
      "dd9c_incremental_semantic", "adm26_string_zonemap",
      "hq33_string_range_hql",
      // round-19: the language pipeline-stage family (semantic dedup /
      // index-backed ANN / layered LSH keeper — self, incremental, and
      // explicit-probe forms, all from parsed text) and the
      // timestamp/double zone-map probes
      "hq34_semantic_dedup_hql", "hq35_nearest_hql", "hq36_near_dedup_hql",
      "adm27_ts_double_zonemap", "hq37_incremental_semantic_hql",
      "hq38_incremental_neardedup_hql", "hq39_nearest_for_hql",
      "hq40_hash_split_hql")
    (Bench.headline ++ extras).foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      sb.append(s"\n## $name\n\n```\n$plan```\n")
    }
    Files.write(Paths.get(out), sb.toString.getBytes("UTF-8"))
    println(s"wrote $out")
    spark.stop()
  }
}
