package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate => LAgg}
import org.apache.spark.sql.functions._
import graft.plans.DistinctElim
import graft.store.{CheckConstraints, TableStore}

/** UNIQUE-proven DISTINCT elimination ([[graft.plans.DistinctElim]]):
  * a `SELECT DISTINCT cols…` over a store table whose validated UNIQUE
  * key ⊆ cols is the identity — these specs pin engagement (the
  * aggregate AND its shuffle disappear), result parity with the rule
  * off, the refusal branches (subset columns, expression outputs, no
  * constraint), and the validity-watermark chain. */
class DistinctElimSpec extends SparkSpec {

  private def scratch(): TableStore =
    new TableStore(spark, Files.createTempDirectory("graft-delim-").toString)

  private def ord: DataFrame =
    spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_orderstatus")

  private def seeded(): TableStore = {
    val st = scratch()
    st.create("t", ord)
    CheckConstraints.declareUnique(st, "t", "t_pk", Seq("o_orderkey"))
    st
  }

  /** USER aggregates only: a MOR-deleted table's read plan contains the
    * vector side's own dedup Aggregate (over `__dv_*` columns) — that's
    * store plumbing, not the DISTINCT under test. */
  private def aggCount(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case a: LAgg if !a.aggregateExpressions.forall(_.name.startsWith("__dv_")) => a
    }.size

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).sorted.toSeq

  test("eliminates the distinct aggregate and matches the rule-off result") {
    val st = seeded()
    def q = st.read("t").select("o_orderkey", "o_orderstatus").distinct()
    val expected = rows(q) // rule not installed
    val rule = DistinctElim.install(spark, st)
    try {
      assert(aggCount(q) === 0, q.queryExecution.optimizedPlan.toString)
      assert(!q.queryExecution.executedPlan.toString.contains("Exchange"),
        "the whole point is erasing the shuffle")
      assert(rows(q) === expected)
    } finally DistinctElim.uninstall(spark, rule)
  }

  test("a filter above the scan preserves the elimination") {
    val st = seeded()
    val rule = DistinctElim.install(spark, st)
    try {
      val q = st.read("t").filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_custkey").distinct()
      assert(aggCount(q) === 0)
      assert(rows(q) === rows(st.read("t")
        .filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_custkey").dropDuplicates()))
    } finally DistinctElim.uninstall(spark, rule)
  }

  test("refuses when the key is NOT a subset of the distinct columns") {
    val st = seeded()
    val rule = DistinctElim.install(spark, st)
    try {
      // distinct on status alone: o_orderkey uniqueness proves nothing
      val q = st.read("t").select("o_orderstatus").distinct()
      assert(aggCount(q) === 1, "must keep the real aggregate")
      assert(rows(q).size === 3)
    } finally DistinctElim.uninstall(spark, rule)
  }

  test("refuses expression outputs and unconstrained tables") {
    val st = seeded()
    st.create("u", ord) // no UNIQUE declared
    val rule = DistinctElim.install(spark, st)
    try {
      val exprQ = st.read("t")
        .select((col("o_orderkey") % 10).as("d")).distinct()
      assert(aggCount(exprQ) === 1, "DISTINCT f(key) is not covered by key uniqueness")
      val unconstrained = st.read("u").select("o_orderkey").distinct()
      assert(aggCount(unconstrained) === 1)
    } finally DistinctElim.uninstall(spark, rule)
  }

  test("raw inserts break the chain; revalidate mends it") {
    val st = seeded()
    val rule = DistinctElim.install(spark, st)
    try {
      def q = st.read("t").select("o_orderkey").distinct()
      assert(aggCount(q) === 0)
      // around admission control: duplicates may exist — stand down
      // and stay CORRECT through the real aggregate
      st.insert("t", ord.limit(50))
      assert(aggCount(q) === 1, "a bypassing write must break the chain")
      assert(rows(q).size === ord.count().toInt,
        "the real aggregate must dedup the raw duplicates")
      // remove them, revalidate: the rewrite comes back
      st.delete("t", lit(false)) // no-op COW, still unvalidated
      assert(aggCount(q) === 1)
      st.truncate("t")
      st.insert("t", ord)
      CheckConstraints.revalidate(st, "t_pk")
      assert(aggCount(q) === 0, "revalidation must restore the rewrite")
    } finally DistinctElim.uninstall(spark, rule)
  }

  test("survives pending deletion vectors (the MOR read shape traverses)") {
    val st = seeded()
    st.deleteMor("t", col("o_orderstatus") === "F" &&
      col("o_orderkey") % 11 === 3)
    def q = st.read("t").select("o_orderkey", "o_custkey").distinct()
    val expected = rows(q) // rule not installed
    val rule = DistinctElim.install(spark, st)
    try {
      assert(aggCount(q) === 0,
        s"tombstones only remove rows — uniqueness holds:\n${q.queryExecution.optimizedPlan}")
      assert(rows(q) === expected)
    } finally DistinctElim.uninstall(spark, rule)
  }

  test("kill switch") {
    val st = seeded()
    val rule = DistinctElim.install(spark, st)
    try {
      spark.conf.set("spark.graft.distinctelim.enabled", "false")
      try assert(aggCount(st.read("t").select("o_orderkey").distinct()) === 1)
      finally spark.conf.unset("spark.graft.distinctelim.enabled")
    } finally DistinctElim.uninstall(spark, rule)
  }
}
