package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.plans.MvRewrite
import graft.store.{MaterializedView, TableStore}
import graft.store.MaterializedView.MvDef

/** Transparent MV rewrite: engagement (the optimized plan reads the
  * view's files, not the base's), answer parity with the rule off,
  * rollup from a key subset, freshness through maintained writes, and
  * the negative space (filters, unregistered sums, distinct, pruned
  * scans must NOT rewrite). */
class MvRewriteSpec extends SparkSpec {

  private def freshStore(): TableStore =
    new TableStore(spark, Files.createTempDirectory("graft-mvrw-").toString)

  private def seed(st: TableStore): Unit = {
    val base = spark.read.parquet(s"$sf/lineitem.parquet").select(
      col("l_returnflag"), col("l_linestatus"),
      expr("CAST(l_quantity AS BIGINT)").as("qty"),
      expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("cents"))
    st.create("facts", base)
    MaterializedView.register(st, "facts_view", "facts",
      MvDef(keys = Seq("l_returnflag", "l_linestatus"),
        sums = Seq("sum_qty" -> "qty", "sum_cents" -> "cents")))
  }

  private def usesView(df: org.apache.spark.sql.DataFrame,
      st: TableStore): Boolean = {
    val files = df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation.asInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.rootPaths.map(_.toUri.getPath)
    }.flatten
    files.nonEmpty && files.forall(_.contains("/facts_view/")) &&
      !files.exists(p => p.contains("/facts/"))
  }

  test("full-key and subset-key aggregates rewrite to the view and answer exactly") {
    val st = freshStore()
    seed(st)
    val rule = MvRewrite.install(spark, st)
    try {
      val full = st.read("facts").groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sum("qty").as("sq"))
      val sub = st.read("facts").groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum("qty").as("sq"), sum("cents").as("sc"))
      assert(usesView(full, st), "full-key aggregate did not engage:\n" +
        full.queryExecution.optimizedPlan.treeString)
      assert(usesView(sub, st), "subset rollup did not engage:\n" +
        sub.queryExecution.optimizedPlan.treeString)
      val got = sub.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      MvRewrite.uninstall(spark, rule)
      val want = st.read("facts").groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum("qty").as("sq"), sum("cents").as("sc"))
        .collect().map(r =>
          (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == want, s"rewritten answer diverged: ${got -- want} vs ${want -- got}")
    } finally MvRewrite.uninstall(spark, rule)
  }

  test("freshness: maintained inserts are visible through the rewrite") {
    val st = freshStore()
    seed(st)
    val rule = MvRewrite.install(spark, st)
    try {
      def total(): Long = st.read("facts").groupBy("l_returnflag")
        .agg(count(lit(1)).as("n")).agg(sum("n")).head.getLong(0)
      val before = total()
      import spark.implicits._
      MaterializedView.insertInto(st, "facts",
        Seq(("Z", "Z", 1L, 100L), ("Z", "Z", 2L, 200L))
          .toDF("l_returnflag", "l_linestatus", "qty", "cents"))
      assert(total() == before + 2,
        "rewrite served a stale view after a maintained insert")
    } finally MvRewrite.uninstall(spark, rule)
  }

  test("a HeroQL group_by over the store table engages the rewrite") {
    // the rule is plan-level, so queries compiled from LANGUAGE text
    // benefit with zero wiring — variables shadowing the physical
    // column names keep the scan projection attribute-only
    val st = freshStore()
    seed(st)
    val rule = MvRewrite.install(spark, st)
    try {
      val df = graft.heroql.HeroQL.compileCollection(
        "data facts(l_returnflag: string, l_linestatus: string, " +
          "qty: int64, cents: int64).",
        """collection_query(l_returnflag, total) :-
             facts(l_returnflag, _, qty, _)
           group_by l_returnflag(l_returnflag, total = Sum(qty))
           ;""",
        Map("facts" -> st.read("facts")))
      assert(usesView(df, st), "HeroQL aggregate did not engage:\n" +
        df.queryExecution.optimizedPlan.treeString)
      val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      MvRewrite.uninstall(spark, rule)
      val want = st.read("facts").groupBy("l_returnflag")
        .agg(sum("qty")).collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == want, s"language-path rewrite diverged: $got vs $want")
    } finally MvRewrite.uninstall(spark, rule)
  }

  test("staleness fence: a raw-txn base write stands the rewrite down, answers stay fresh") {
    val st = freshStore()
    seed(st)
    val rule = MvRewrite.install(spark, st)
    try {
      import spark.implicits._
      def agg() = st.read("facts").groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"))
      assert(usesView(agg(), st), "precondition: eligible aggregate should engage")
      // a raw transaction bypasses view maintenance entirely — the
      // base manifest moves, the view's watermark doesn't
      st.transaction(_.insert("facts",
        Seq(("Q", "Q", 3L, 300L)).toDF("l_returnflag", "l_linestatus", "qty", "cents")))
      val after = agg()
      assert(!usesView(after, st),
        "rewrite must stand down once the base outran the view:\n" +
          after.queryExecution.optimizedPlan.treeString)
      assert(after.filter(col("l_returnflag") === "Q").head.getLong(1) == 1L,
        "the fresh base row must be visible")
      // the next MAINTAINED write detects the divergence (its pre-write
      // manifest no longer matches the view's watermark), self-heals
      // with a full rebuild, and re-arms the rewrite — now including
      // the bypassed row
      MaterializedView.insertInto(st, "facts",
        Seq(("Q", "Q", 4L, 400L)).toDF("l_returnflag", "l_linestatus", "qty", "cents"))
      val healed = agg()
      assert(usesView(healed, st),
        "a maintained write must self-heal the view and re-arm the rewrite")
      assert(healed.filter(col("l_returnflag") === "Q").head.getLong(1) == 2L,
        "the rebuilt view must include the previously bypassed row")
    } finally MvRewrite.uninstall(spark, rule)
  }

  test("the plain mutation facade maintains registered views and keeps the rewrite armed") {
    val st = freshStore()
    seed(st)
    val rule = MvRewrite.install(spark, st)
    try {
      import spark.implicits._
      def agg() = st.read("facts").groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum("qty").as("sq"))
      def grab(flag: String) = agg().filter(col("l_returnflag") === flag)
        .collect().toList.map(r => (r.getLong(1), r.getLong(2)))
      st.insert("facts", Seq(("Y", "Y", 5L, 500L), ("Y", "Y", 7L, 700L))
        .toDF("l_returnflag", "l_linestatus", "qty", "cents"))
      assert(usesView(agg(), st), "facade insert must keep the rewrite armed")
      assert(grab("Y") == List((2L, 12L)), s"insert not folded: ${grab("Y")}")
      st.update("facts", Map("qty" -> (col("qty") + 1L)), col("l_returnflag") === "Y")
      assert(usesView(agg(), st), "facade update must keep the rewrite armed")
      assert(grab("Y") == List((2L, 14L)), s"update not folded: ${grab("Y")}")
      st.delete("facts", col("l_returnflag") === "Y" && col("qty") === 6L)
      assert(usesView(agg(), st), "facade delete must keep the rewrite armed")
      assert(grab("Y") == List((1L, 8L)), s"delete not folded: ${grab("Y")}")
      // global count over an emptied base answers 0 through the view
      st.delete("facts", lit(true))
      val global = st.read("facts").agg(count(lit(1)).as("n"))
      assert(usesView(global, st), "global count must engage after full delete")
      assert(global.head.getLong(0) == 0L,
        "sum(n_rows) over an empty view must coalesce to 0, not NULL")
    } finally MvRewrite.uninstall(spark, rule)
  }

  test("negative space: filters, unregistered sums, distinct, pruned scans stay on the base") {
    val st = freshStore()
    seed(st)
    val rule = MvRewrite.install(spark, st)
    try {
      val filtered = st.read("facts").filter(col("qty") > 10)
        .groupBy("l_returnflag").agg(sum("qty").as("s"))
      assert(!usesView(filtered, st), "a filtered aggregate must not rewrite")
      val unregistered = st.read("facts").groupBy("l_returnflag")
        .agg(sum(col("qty") * 2).as("s"))
      assert(!usesView(unregistered, st), "an unregistered sum must not rewrite")
      val distinct = st.read("facts").groupBy("l_returnflag")
        .agg(countDistinct("l_linestatus").as("d"))
      assert(!usesView(distinct, st), "a distinct aggregate must not rewrite")
      // rule disabled by conf: even an eligible aggregate stays put
      spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
      try {
        val eligible = st.read("facts").groupBy("l_returnflag")
          .agg(sum("qty").as("s"))
        assert(!usesView(eligible, st), "the kill switch must stop rewrites")
      } finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
    } finally MvRewrite.uninstall(spark, rule)
  }
}
