package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.JvRewrite
import graft.store.{JoinViews, TableStore}

/** Transparent JOIN-view rewrite: engagement (the optimized plan reads
  * only the view's files), answer parity with the rule off (raw and
  * USING-style joins), freshness refusal after a bypassing base write,
  * and the negative space (filtered scans, wrong keys, outer joins
  * must NOT rewrite). */
class JvRewriteSpec extends SparkSpec {

  private def freshStore(): TableStore =
    new TableStore(spark, Files.createTempDirectory("graft-jvrw-").toString)

  private def seed(st: TableStore): Unit = {
    st.create("dim", spark.read.parquet(s"$sf/customer.parquet").select(
      col("c_custkey").as("o_custkey"), col("c_mktsegment")))
    st.create("fact", spark.read.parquet(s"$sf/orders.parquet").select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus")))
    JoinViews.register(st, "fd_jv", "fact", "dim", Seq("o_custkey"))
  }

  private def usesView(df: DataFrame): Boolean = {
    val files = df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation.asInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.rootPaths.map(_.toUri.getPath)
    }.flatten
    files.nonEmpty && files.forall(_.contains("/fd_jv/")) &&
      !files.exists(p => p.contains("/fact/") || p.contains("/dim/"))
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).sorted.toSeq

  test("inner equi-joins (raw and USING) rewrite to the view, answers exact") {
    val st = freshStore()
    seed(st)
    val rule = JvRewrite.install(spark, st)
    try {
      val f = st.read("fact"); val d = st.read("dim")
      val raw = f.join(d, f("o_custkey") === d("o_custkey"))
      val using = st.read("fact").join(st.read("dim"), Seq("o_custkey"))
      assert(usesView(raw), "raw equi-join did not engage:\n" +
        raw.queryExecution.optimizedPlan.treeString)
      assert(usesView(using), "USING join did not engage:\n" +
        using.queryExecution.optimizedPlan.treeString)
      val got = sortedRows(using)
      JvRewrite.uninstall(spark, rule)
      assert(got === sortedRows(
        st.read("fact").join(st.read("dim"), Seq("o_custkey"))),
        "rewritten answer diverged from the real join")
    } finally JvRewrite.uninstall(spark, rule)
  }

  test("maintained inserts stay visible; a bypassing write stands down") {
    val st = freshStore()
    seed(st)
    val rule = JvRewrite.install(spark, st)
    try {
      def joined(): DataFrame =
        st.read("fact").join(st.read("dim"), Seq("o_custkey"))
      val before = joined().count()
      import spark.implicits._
      st.insert("fact", Seq((-1L, 1L, "X"), (-2L, 1L, "X"))
        .toDF("o_orderkey", "o_custkey", "o_orderstatus"))
      assert(usesView(joined()), "rewrite must stay engaged after " +
        "maintained inserts")
      assert(joined().count() > before,
        "maintained insert must be visible through the rewrite")
      // bypassing raw-txn write → watermark mismatch → no rewrite,
      // answer still exact from the base scan
      st.transaction(_.insert("fact",
        Seq((-3L, 1L, "X")).toDF("o_orderkey", "o_custkey", "o_orderstatus")))
      val after = joined()
      assert(!usesView(after),
        "rewrite must stand down after a bypassing base write")
      assert(after.filter(col("o_orderkey") === -3L).count() === 1)
    } finally JvRewrite.uninstall(spark, rule)
  }

  test("negative space: filters, wrong keys, outer joins do not rewrite") {
    val st = freshStore()
    seed(st)
    val rule = JvRewrite.install(spark, st)
    try {
      val filtered = st.read("fact").filter(col("o_orderkey") % 2 === 0)
        .join(st.read("dim"), Seq("o_custkey"))
      assert(!usesView(filtered), "filtered side must keep its scan")
      val f = st.read("fact"); val d = st.read("dim")
      val theta = f.join(d, f("o_custkey") < d("o_custkey"))
      assert(!usesView(theta), "theta join must not rewrite")
      val outer = st.read("fact").join(st.read("dim"), Seq("o_custkey"), "left")
      assert(!usesView(outer), "outer join must not rewrite")
    } finally JvRewrite.uninstall(spark, rule)
  }
}
