package graft

import org.apache.spark.sql.functions._

/** Physical-plan audits beyond RelationalSpec's: each hot operator must
  * compile to the plan SHAPE its scale story depends on — not just the
  * right rows. A regression here is a 100×-scale problem that no
  * row-level oracle would catch. */
class PlanAuditSpec extends SparkSpec {

  private def plan(pack: graft.queries.QueryPack, q: String): String =
    pack.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("HeroQL rank-filter compiles to WindowGroupLimit (partial + final)") {
    val p = plan(graft.queries.HeroQueries, "hq2_top3_per_partition")
    assert(p.contains("WindowGroupLimit"), s"no WindowGroupLimit:\n$p")
    assert(p.contains("Partial") && p.contains("Final"),
      "expected map-side partial group-limit before the shuffle")
  }

  test("dd5 all-pairs cosine broadcasts one side (no shuffle of the pair stream)") {
    val p = plan(graft.queries.Dedup, "dd5_embedding_neardup")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"embedding pair join must broadcast:\n$p")
  }

  test("ann1 probe set is broadcast against the corpus scan") {
    val p = plan(graft.queries.Similarity, "ann1_bruteforce_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"probe side must broadcast:\n$p")
  }

  test("salted skew join shuffles on (key, salt), not the key alone") {
    val p = plan(graft.queries.Relational, "j11_salted_skew_join")
    assert(p.contains("__salt"), s"salt missing from exchange:\n$p")
  }

  test("asof join is one window pass, not a per-row lookup join") {
    val p = plan(graft.queries.Relational, "j9_asof_join")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"),
      s"expected window-based asof:\n$p")
    assert(!p.contains("CartesianProduct"), "asof must not enumerate pairs")
  }

  test("scan projection prunes to the read schema on the documents table") {
    val p = plan(graft.queries.TextAnalysis, "tx4_fingerprint")
    // fingerprint reads doc_id + text only; the scan must not read lang/source
    val scan = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(scan.contains("doc_id") && scan.contains("text"), s"scan: $scan")
    assert(!scan.contains("source"), s"unprojected column read: $scan")
  }
}
