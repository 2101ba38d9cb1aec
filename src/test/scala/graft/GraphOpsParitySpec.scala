package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.GraphOps

/** The all-DataFrame large-star/small-star connected components
  * ([[GraphOps.connectedComponentsDF]]) must produce EXACTLY the
  * labels GraphX's Pregel min-id propagation produces — same nodes,
  * same min-id component per node — on every graph shape that
  * exercises a different convergence path: long chains (many rounds),
  * stars (one round), disjoint cliques, self-loops/duplicates, the
  * real nation co-region graph, and the dedup pair graph it now
  * resolves in production (dd7). */
class GraphOpsParitySpec extends SparkSpec {

  private def labels(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def assertParity(edges: DataFrame): Unit = {
    val got = labels(GraphOps.connectedComponentsDF(spark, edges))
    val want = labels(GraphOps.connectedComponents(spark, edges))
    assert(got === want)
  }

  test("chain graph (worst-case rounds) matches GraphX") {
    // one path 0-1-2-...-199 plus a second chain offset by 1000
    val e = spark.range(199).select(col("id").as("src"), (col("id") + 1).as("dst"))
      .unionByName(spark.range(1000, 1149).select(
        col("id").as("src"), (col("id") + 1).as("dst")))
    val got = labels(GraphOps.connectedComponentsDF(spark, e))
    assert(got.values.toSet === Set(0L, 1000L), "two chains, two min-id roots")
    assertParity(e)
  }

  test("stars, cliques, duplicates and self-loops match GraphX") {
    // star around 5000; a 6-clique on 7000..7005; dup/self-loop noise
    val star = spark.range(100).select(
      (col("id") + 5001).as("src"), lit(5000L).as("dst"))
    val clique = spark.range(36).select(
      (lit(7000L) + col("id") % 6).as("src"),
      (lit(7000L) + col("id") / 6).as("dst"))
    val noise = spark.range(10).select(
      lit(5003L).as("src"), lit(5000L).as("dst")) // duplicate edges
      .unionByName(spark.range(3).select(
        lit(9000L).as("src"), lit(9000L).as("dst"))) // pure self-loops
    assertParity(star.unionByName(clique).unionByName(noise))
  }

  test("empty edge set yields an empty labeling") {
    val e = spark.range(0).select(col("id").as("src"), col("id").as("dst"))
    assert(GraphOps.connectedComponentsDF(spark, e).count() === 0)
  }

  test("nation co-region graph (g2's input) matches GraphX exactly") {
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val a = nation.select(col("n_nationkey").as("ak"), col("n_regionkey").as("rk"))
    val b = nation.select(col("n_nationkey").as("bk"), col("n_regionkey").as("rk"))
    val edges = a.join(b, "rk").filter(col("ak") < col("bk"))
      .select(col("ak").as("src"), col("bk").as("dst"))
    assertParity(edges)
  }

  test("documents near-dup pair graph (dd7's input shape) matches GraphX") {
    // the corpus has no byte-identical texts; shared 40-char prefixes
    // give a realistic chained pair graph of the same shape dd7 feeds
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), substring(col("text"), 1, 40).as("fp"))
    val a = docs.select(col("doc_id").as("src"), col("fp"))
    val b = docs.select(col("doc_id").as("dst"), col("fp"))
    val pairs = a.join(b, "fp").filter(col("src") < col("dst"))
      .select("src", "dst")
    assert(pairs.count() > 0, "fixture premise: shared-prefix docs exist")
    assertParity(pairs)
  }
}
