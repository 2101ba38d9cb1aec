package graft

import org.apache.spark.sql.functions._
import graft.queries.{Dedup, TextAnalysis, TrainingSetQueries}

/** Property + plan specs for the round-9 pipeline additions: semantic
  * dedup (dd9), contamination spans (dc2), DSIR importance weighting
  * (samp4), and PII redaction (tx7). The DuckDB gate pins exact values;
  * these pin the invariants and the plan shapes the 100 TB story
  * depends on. Invariant tests run at sf0.01 (the gate SF) so the
  * results are non-vacuous. */
class PipelineOpsSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.01"

  private def q(pack: graft.queries.QueryPack, name: String, dir: String = sf01) =
    pack.queries(name)(spark, dir)

  test("dd9: dup_of is an earlier member of the same cluster, similarity at/above tau") {
    val out = q(Dedup, "dd9_semantic_dedup").cache()
    try {
      val rows = out.collect()
      assert(rows.nonEmpty, "semantic dedup found nothing — vacuous fixture")
      rows.foreach { r =>
        assert(r.getLong(2) < r.getLong(0),
          s"dup_of ${r.getLong(2)} not earlier than vec ${r.getLong(0)}")
        assert(r.getDouble(3) >= 0.4 - 1e-9,
          s"max_cos ${r.getDouble(3)} below threshold")
      }
      // dup_of must share the duplicate's cluster: re-derive each vector's
      // nearest centroid independently (brute force over collected rows)
      val e = Tables.t(spark, sf01, "embeddings")
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
      val cents = e.keys.filter(id => id % 13 == 5).toSeq.sorted.take(16)
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
        d / (math.sqrt(na) * math.sqrt(nb))
      }
      def cluster(id: Long): Long =
        cents.map(c => (-cos(e(id), e(c)), c)).min._2
      rows.foreach { r =>
        assert(r.getLong(1) == cluster(r.getLong(0)),
          s"vec ${r.getLong(0)} labeled cluster ${r.getLong(1)}, nearest is ${cluster(r.getLong(0))}")
        assert(cluster(r.getLong(2)) == r.getLong(1),
          s"dup_of ${r.getLong(2)} lives in a different cluster")
      }
    } finally out.unpersist()
  }

  test("dd9 pair search shuffles cluster-local, assignment argmax partial-aggregates") {
    val p = q(Dedup, "dd9_semantic_dedup", sf).queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(cluster_id") || p.contains("hashpartitioning(bc"),
      s"pair join must shuffle on the cluster key:\n$p")
    assert(p.contains("partial_max"),
      s"nearest-centroid argmax must have a map-side partial phase:\n$p")
    assert(!p.contains("Window"),
      s"neither assignment nor verdict may sort a window:\n$p")
  }

  test("dc2: spans are merged hit regions — bounds, ordering, and a multi-span doc") {
    val out = q(TrainingSetQueries, "dc2_contamination_spans").cache()
    try {
      val rows = out.collect()
      assert(rows.nonEmpty, "no contaminated training docs — vacuous fixture")
      rows.foreach { r =>
        val (grams, spans, maxTok, totTok) =
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        assert(r.getLong(0) % 7 != 0, "an eval doc leaked into the train side")
        assert(spans >= 1 && grams >= spans, s"span/gram counts inconsistent: $r")
        assert(maxTok >= 8, s"a span must cover at least one 8-gram: $r")
        assert(totTok >= maxTok && totTok <= grams + 7 * spans,
          s"token totals outside merged-span bounds: $r")
      }
      // the excerpt-based eval side must produce at least one document hit
      // in two DISJOINT regions — the case the merge logic exists for
      assert(rows.exists(_.getLong(2) > 1), "no multi-span contamination found")
    } finally out.unpersist()
  }

  test("samp4: target docs excluded, scores deterministic across runs") {
    val a = q(TrainingSetQueries, "samp4_dsir_importance").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(a.nonEmpty, "no scored documents")
    val targetIds = Tables.t(spark, sf01, "documents")
      .filter(col("source").isin("src0", "src1", "src2"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a.forall(r => !targetIds.contains(r._1)),
      "a target-domain doc received an importance score")
    // every non-target doc scores (the weight table covers all buckets)
    val nonTarget = Tables.t(spark, sf01, "documents")
      .filter(!col("source").isin("src0", "src1", "src2")).count()
    assert(a.length.toLong == nonTarget,
      s"${a.length} scored vs $nonTarget non-target docs")
    val b = q(TrainingSetQueries, "samp4_dsir_importance").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(a.sameElements(b), "scores differ between runs — not retry-stable")
  }

  test("samp4 weight table broadcasts; the corpus is never shuffled on a wide key") {
    val p = q(TrainingSetQueries, "samp4_dsir_importance", sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"the 256-row weight table must broadcast:\n$p")
    assert(!p.contains("hashpartitioning(text") && !p.contains("hashpartitioning(gram"),
      s"no text may cross an exchange:\n$p")
  }

  test("tx7: planted PII is found and fully redacted; untouched docs keep zero counts") {
    val out = q(TextAnalysis, "tx7_pii_redaction").cache()
    try {
      val rows = out.collect()
      rows.foreach { r =>
        val id = r.getLong(0)
        val expect = (id % 7) match {
          case 0 => (1L, 0L, 0L); case 1 => (0L, 1L, 0L); case 2 => (0L, 0L, 1L)
          case _ => (0L, 0L, 0L)
        }
        assert((r.getLong(1), r.getLong(2), r.getLong(3)) == expect,
          s"doc $id counts ${(r.getLong(1), r.getLong(2), r.getLong(3))} != $expect")
      }
      // redaction leaves no residual matches: rebuild the redacted text
      // with the operator's own chain and scan it with the same patterns
      val residual = Tables.t(spark, sf01, "documents")
        .withColumn("aug", expr(
          """concat(text, CASE CAST(doc_id % 7 AS INT)
             WHEN 0 THEN concat(' contact user', CAST(doc_id AS STRING), '@example.com now')
             WHEN 1 THEN concat(' host 10.0.', CAST(doc_id % 256 AS STRING), '.',
                                CAST(doc_id % 100 AS STRING), ' up')
             WHEN 2 THEN concat(' call +1-555-', lpad(CAST(doc_id % 10000 AS STRING), 4, '0'), ' today')
             ELSE '' END)"""))
        .withColumn("red", regexp_replace(regexp_replace(regexp_replace(col("aug"),
          "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
          "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}", "<IP>"),
          "\\+1-555-\\d{4}", "<PHONE>"))
        .filter(
          size(regexp_extract_all(col("red"),
            lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"), lit(0))) > 0 ||
          size(regexp_extract_all(col("red"),
            lit("\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"), lit(0))) > 0 ||
          size(regexp_extract_all(col("red"), lit("\\+1-555-\\d{4}"), lit(0))) > 0)
        .count()
      assert(residual == 0L, s"$residual documents still match a PII pattern after redaction")
    } finally out.unpersist()
  }

  test("tx7 redaction is map-only: no exchange in the plan") {
    val p = q(TextAnalysis, "tx7_pii_redaction", sf).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"PII scrub must not shuffle:\n$p")
  }

  test("dd10: duplicated spans match a brute-force recomputation at sf0.001") {
    val docs = Tables.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq).toMap
    // every 16-gram occurrence corpus-wide, then per-doc islands (gap <= 16)
    val occ = scala.collection.mutable.Map.empty[Seq[String], Int]
    docs.values.foreach { toks =>
      toks.sliding(16).filter(_.length == 16).foreach(g => occ(g) = occ.getOrElse(g, 0) + 1)
    }
    val expected = docs.flatMap { case (id, toks) =>
      val hits = toks.sliding(16).zipWithIndex
        .collect { case (g, i) if g.length == 16 && occ(g) >= 2 => (i + 1).toLong }
        .toSeq
      if (hits.isEmpty) None
      else {
        val spans = hits.foldLeft(List.empty[(Long, Long)]) {
          case ((s0, e0) :: rest, p) if p - (e0 - 15) <= 16 => (s0, p + 15) :: rest
          case (acc, p) => (p, p + 15) :: acc
        }.map { case (s0, e0) => e0 - s0 + 1 }
        Some(id -> (spans.size.toLong, spans.max, spans.sum))
      }
    }
    val got = q(graft.queries.Dedup, "dd10_duplicate_spans", sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expected, s"dd10 mismatch:\n got=$got\n exp=$expected")
    assert(expected.nonEmpty, "no duplicated spans at sf0.001 — vacuous fixture")
  }

  test("dd10 shuffles gram fingerprints, never gram text") {
    val p = q(graft.queries.Dedup, "dd10_duplicate_spans", sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(gram_fp"),
      s"occurrence count must shuffle on the 8-byte fingerprint:\n$p")
    assert(!p.contains("hashpartitioning(col") && !p.contains("hashpartitioning(gram,"),
      s"raw gram strings must not cross an exchange:\n$p")
  }

  test("ev1: sessions partition each user's events and respect the 30-minute gap") {
    val out = q(graft.queries.Streaming, "ev1_sessionization", sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val events = graft.streaming.EventStreams
      .tsNanos(Tables.t(spark, sf, "events"), "tns")
      .select("user_id", "tns").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).sorted }
    // per user: session event counts sum to the user's event count
    val perUser = out.groupBy(_._1)
    assert(perUser.keySet == events.keySet, "user sets differ")
    perUser.foreach { case (u, sess) =>
      assert(sess.map(_._3).sum == events(u).size.toLong,
        s"user $u sessions do not partition its events")
      // brute-force the session count from the sorted timestamps
      val gaps = events(u).sliding(2).count {
        case Array(a, b) => b - a > 1800000000000L
        case _ => false
      }
      assert(sess.size == gaps + 1,
        s"user $u expected ${gaps + 1} sessions, got ${sess.size}")
      // sessions are ordered and non-overlapping in time
      val ordered = sess.sortBy(_._2)
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5 < b._4, s"user $u sessions ${a._2} and ${b._2} overlap")
        case _ =>
      }
    }
  }

  test("pipe3: every re-crawled copy collapses onto its original after redaction") {
    val out = q(graft.queries.PipelineQueries, "pipe3_redacted_dedup").collect()
    val removed = out.map(_.getLong(2)).sum
    val recrawl = Tables.t(spark, sf01, "documents")
      .filter(col("doc_id") % 5 === 0).count()
    assert(removed == recrawl,
      s"$removed removed vs $recrawl re-crawled copies — redaction failed to normalize")
    // two-shuffle plan, fp-keyed dedup exchange — pipe2's shape
    val p = q(graft.queries.PipelineQueries, "pipe3_redacted_dedup", sf)
      .queryExecution.executedPlan.toString
    val shuffles = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(shuffles.size == 2,
      s"expected dedup + lang agg as the ONLY shuffles, found ${shuffles.size}:\n$p")
    assert(shuffles.exists(_.contains("hashpartitioning(fp")),
      s"dedup exchange must carry the 8-byte fingerprint:\n${shuffles.mkString("\n")}")
  }
}
