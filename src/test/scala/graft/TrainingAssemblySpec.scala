package graft

import org.apache.spark.sql.functions._
import graft.queries.{Dedup, TrainingSetQueries}

/** Property specs for the round-9 training-set assembly additions:
  * duplicate-cluster resolution (dd7), chunk-level span dedup (dd8),
  * temperature mixture sampling (samp3), and sequence packing
  * (pack1/pack2). The DuckDB gate pins exact values; these pin the
  * INVARIANTS the exact values can't express — cluster transitivity,
  * single-survivor-per-span, realized-rate tracking, packing bounds —
  * plus non-vacuousness so a silently-empty result can't pass. */
class TrainingAssemblySpec extends SparkSpec {

  private def q(pack: graft.queries.QueryPack, name: String) =
    pack.queries(name)(spark, sf)

  test("dd7: clusters are transitive over the pair set, keepers minimal, non-vacuous") {
    val clusters = q(Dedup, "dd7_duplicate_clusters").cache()
    try {
      val rows = clusters.collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      // keeper is the component minimum → never above the member's id
      assert(rows.forall { case (id, (k, _)) => k <= id },
        "a keeper id exceeds its member's id")
      // keepers are members of their own cluster and label themselves
      rows.values.map(_._1).toSet.foreach { k: Long =>
        assert(rows(k)._1 == k, s"keeper $k is not its own keeper")
      }
      // both endpoints of every near-dup pair share a keeper (the whole
      // point of cluster resolution vs raw pairs)
      val pairs = Dedup.queries("dd2_ngram_jaccard")(spark, sf)
        .select("a_id", "b_id").collect()
      pairs.foreach { p =>
        val (a, b) = (p.getLong(0), p.getLong(1))
        assert(rows(a)._1 == rows(b)._1,
          s"pair ($a, $b) resolved to different clusters")
      }
      // cluster_size is consistent with the labeling
      val sizes = rows.values.groupBy(_._1).map { case (k, v) => k -> v.size }
      rows.foreach { case (id, (k, cs)) =>
        assert(cs == sizes(k), s"doc $id cluster_size $cs != ${sizes(k)}")
      }
      // non-vacuous: the fixture contains chained duplicates
      assert(rows.values.exists(_._2 > 1), "no multi-doc cluster found")
    } finally clusters.unpersist()
  }

  test("dd8: every duplicated chunk keeps exactly one survivor corpus-wide") {
    val stats = q(Dedup, "dd8_chunk_dedup").cache()
    try {
      val agg = stats.agg(
        sum(col("n_chunks")).as("chunks"),
        sum(col("n_chunks_dropped")).as("dropped"),
        sum(col("n_tokens_kept")).as("kept_tok"),
        sum(col("n_tok")).as("tok")).head()
      val (chunks, dropped) = (agg.getLong(0), agg.getLong(1))
      // survivors == distinct chunk fingerprints (one keeper per span)
      val distinctFps = Tables.t(spark, sf, "documents")
        .withColumn("toks", expr("split(trim(text), '\\\\s+')"))
        .select(explode(expr(
          """transform(sequence(1, CAST(ceil(size(toks) / 16.0) AS INT)),
             i -> concat_ws(' ', slice(toks, 1 + 16 * (i - 1), 16)))""")).as("c"))
        .select(graft.operators.TextFns.fingerprintOf(col("c")).as("fp"))
        .distinct().count()
      assert(chunks - dropped == distinctFps,
        s"survivors ${chunks - dropped} != distinct spans $distinctFps")
      // retained tokens never exceed the document's tokens
      assert(stats.filter(col("n_tokens_kept") > col("n_tok")).isEmpty,
        "a document retained more tokens than it has")
      assert(dropped > 0, "fixture has cross-doc duplicate spans; none dropped")
    } finally stats.unpersist()
  }

  test("samp3: realized per-language rate tracks the 1/sqrt(n) target") {
    val mix = q(TrainingSetQueries, "samp3_temperature_mix").collect()
    assert(mix.length >= 3, "expected one row per language")
    mix.foreach { r =>
      val (n, lim, kept) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(kept <= n)
      val realized = kept.toDouble / n
      val target = lim.toDouble / 10000
      // binomial noise at n≈60-220: 3σ ≈ 3·sqrt(t(1-t)/n) ≲ 0.2
      assert(math.abs(realized - target) < 0.2,
        s"${r.getString(0)}: realized $realized vs target $target — the " +
          "sampling key is biased (see packed()'s low-bit note)")
    }
  }

  test("tx6: per-language cut keeps the top ~75% and never inverts the score order") {
    val kept = graft.queries.TextAnalysis
      .queries("tx6_quality_quantile_filter")(spark, sf)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getDouble(2)))
    val all = graft.queries.TextAnalysis.queries("tx2_quality_score")(spark, sf)
      .select("doc_id", "quality").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val langOf = Tables.t(spark, sf, "documents").select("doc_id", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    kept.groupBy(_._1).foreach { case (lang, ks) =>
      val total = langOf.count(_._2 == lang)
      val frac = ks.length.toDouble / total
      assert(frac > 0.70 && frac <= 0.80, s"$lang kept $frac of $total")
      // no dropped doc outscores a kept doc (ties broken by doc_id)
      val keptIds = ks.map(_._2).toSet
      val (wq, wid) = ks.map(k => (k._3, k._2)).minBy(k => (k._1, k._2))
      langOf.filter { case (id, l) => l == lang && !keptIds.contains(id) }
        .foreach { case (id, _) =>
          assert(all(id) < wq || (all(id) == wq && id < wid),
            s"dropped doc $id outranks a kept doc")
        }
    }
  }

  test("tx6b: histogram cut agrees with the exact sort cut up to the bucket width") {
    val exact = q(graft.queries.TextAnalysis, "tx6_quality_quantile_filter")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val hist = q(graft.queries.TextAnalysis, "tx6b_quantile_histogram").cache()
    try {
      val kept = hist.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      val keptIds = kept.map(_._1).toSet
      // the two cut definitions may only disagree about docs whose
      // quantized score sits exactly at a cut bucket — a 1e-4 band;
      // everything clearly above or below must classify identically
      val qualOf = q(graft.queries.TextAnalysis, "tx2_quality_score")
        .select("doc_id", "quality").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val disagree = (exact diff keptIds) ++ (keptIds diff exact)
      assert(disagree.size < qualOf.size / 50,
        s"${disagree.size} of ${qualOf.size} docs classified differently")
      // kept fraction lands on the same ~75% target per language
      val langTotals = Tables.t(spark, sf, "documents").groupBy("lang").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      kept.groupBy(_._2).foreach { case (lang, ks) =>
        val frac = ks.length.toDouble / langTotals(lang)
        assert(frac > 0.70 && frac <= 0.82, s"$lang kept $frac")
      }
      // threshold property of the bucket cut: no kept doc's bucket is
      // below any dropped doc's bucket within a language
      val keptMin = kept.groupBy(_._2).map { case (l, ks) =>
        l -> ks.map(k => math.floor(k._3 * 10000).toLong).min }
      Tables.t(spark, sf, "documents").select("doc_id", "lang").collect()
        .map(r => (r.getLong(0), r.getString(1)))
        .filterNot(d => keptIds.contains(d._1))
        .foreach { case (id, lang) =>
          assert(math.floor(qualOf(id) * 10000).toLong < keptMin(lang),
            s"dropped doc $id sits at/above $lang's kept bucket floor")
        }
    } finally hist.unpersist()
  }

  test("emb1: quantization error is bounded by half a code step") {
    val q = graft.queries.Similarity.queries("emb1_quantization")(spark, sf)
    val rows = q.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (scale, rms) = (r.getDouble(2), r.getDouble(3))
      // nearest-integer codes are within scale/2 per dimension unless
      // clamped, and max-abs/127 scaling means nothing clamps
      assert(rms <= scale / 2 + 1e-9,
        s"vec ${r.getLong(0)}: rms $rms exceeds half step ${scale / 2}")
      assert(rms > 0 || scale <= 1e-10, "zero error on a nonzero vector")
    }
  }

  test("pack1/pack2: shards spread uniformly, sequences contiguous and budget-bounded") {
    val docs = q(TrainingSetQueries, "pack1_sequence_packing").cache()
    try {
      // the fp%8 low-bit trap left half the shards empty — the DIV fold
      // key must populate all of them, roughly evenly
      val byShard = docs.groupBy("shard").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(byShard.keySet == (0L until 8L).toSet,
        s"empty shards: ${(0L until 8L).toSet -- byShard.keySet}")
      val (mn, mx) = (byShard.values.min, byShard.values.max)
      assert(mx < 3 * mn, s"shard skew $byShard")
      // per-shard sequence ids are 1..max with no gaps (next-fit is
      // contiguous by construction — a gap means the cumsum broke)
      val maxDoc = docs.agg(max("n_tok")).head().getLong(0)
      val bins = q(TrainingSetQueries, "pack2_packing_stats").collect()
      bins.groupBy(_.getLong(0)).foreach { case (shard, bs) =>
        val ids = bs.map(_.getLong(1)).sorted
        assert(ids.head == 1L && ids.last == ids.length.toLong,
          s"shard $shard sequence ids not contiguous: ${ids.mkString(",")}")
      }
      // a sequence overflows the 512 budget only by its straddling doc
      bins.foreach { b =>
        assert(b.getLong(3) < 512 + maxDoc,
          s"sequence (${b.getLong(0)},${b.getLong(1)}) holds ${b.getLong(3)} tokens")
      }
    } finally docs.unpersist()
  }

  test("pack3: epoch shuffles are bijective, reproducible, and differ across epochs") {
    def perm(epoch: Long): Map[Long, (Long, Long)] =
      TrainingSetQueries.epochShuffle(spark, sf, epoch).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val e2 = perm(2L)
    // bijection: every document appears once, and each shard's positions
    // are exactly 1..n (a dropped or duplicated row breaks training
    // accounting silently otherwise)
    val nDocs = q(TrainingSetQueries, "pack1_sequence_packing").count()
    assert(e2.size.toLong == nDocs, s"${e2.size} placed of $nDocs docs")
    e2.values.groupBy(_._1).foreach { case (shard, vs) =>
      val ps = vs.map(_._2).toSeq.sorted
      assert(ps == (1L to ps.length.toLong),
        s"shard $shard positions not contiguous from 1")
    }
    // reproducible: the permutation is a pure function of (epoch, id)
    assert(perm(2L) == e2, "same epoch produced a different permutation")
    // epoch-sensitive: a different epoch reorders (the whole point —
    // equality here would mean the seed never reached the key)
    val e3 = perm(3L)
    assert(e3.keySet == e2.keySet, "epoch changed the document set")
    assert(e2.count { case (id, sp) => e3(id) != sp } > e2.size / 2,
      "epoch 3 left most placements unchanged — seed not mixing")
  }
}
