package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
import org.apache.spark.sql.functions._
import graft.plans.FkJoinElim
import graft.store.{CheckConstraints, TableStore}

/** FK join elimination ([[graft.plans.FkJoinElim]]): the constraint
  * machinery proves `fact ⋈ dim ON fk = pk` is the identity on fact
  * when the dim contributes only its key — these specs pin engagement,
  * result parity with the rule off, every refusal branch, and the
  * validity-watermark chain (a write that bypasses admission control
  * must stand the rewrite down until revalidation). */
class FkElimSpec extends SparkSpec {

  private def scratch(): TableStore =
    new TableStore(spark, Files.createTempDirectory("graft-fkelim-").toString)

  private def cust: DataFrame =
    spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_mktsegment")

  private def ord: DataFrame =
    spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_orderstatus")

  private def seeded(): TableStore = {
    val st = scratch()
    st.create("dim", cust)
    st.create("fact", ord.filter(col("o_orderkey") % 3 === 0))
    CheckConstraints.declareUnique(st, "dim", "dim_pk", Seq("c_custkey"))
    CheckConstraints.declareForeignKey(st, "fact", "fact_fk",
      Seq("o_custkey"), "dim", Seq("c_custkey"))
    st
  }

  private def keyOnlyJoin(st: TableStore): DataFrame =
    st.read("fact").join(st.read("dim"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))

  /** USER joins only: a MOR-deleted table's read plan contains the
    * deletion-vector anti-join (on `__dv_*` columns) — store plumbing,
    * not the dimension join under test. */
  private def joinCount(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case j: LJoin if !j.condition.exists(
        _.references.exists(_.name.startsWith("__dv_"))) => j
    }.size

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).sorted.toSeq

  test("eliminates the join and matches the rule-off result") {
    val st = seeded()
    val expected = rows(keyOnlyJoin(st)) // rule not installed
    val rule = FkJoinElim.install(spark, st)
    try {
      val q = keyOnlyJoin(st)
      assert(joinCount(q) === 0, q.queryExecution.optimizedPlan.toString)
      assert(rows(q) === expected)
    } finally FkJoinElim.uninstall(spark, rule)
  }

  test("checked inserts keep the chain alive; raw inserts break it; revalidate mends it") {
    val st = seeded()
    val rule = FkJoinElim.install(spark, st)
    try {
      // through admission control: still eliminated
      CheckConstraints.insert(st, "fact", ord.filter(col("o_orderkey") % 3 === 1))
      assert(joinCount(keyOnlyJoin(st)) === 0)
      // around it: the chain is broken — rewrite must stand down,
      // result must still be correct (now via the real join)
      st.insert("fact", ord.filter(col("o_orderkey") % 3 === 2))
      val q = keyOnlyJoin(st)
      assert(joinCount(q) === 1, "stale constraint proof must not eliminate")
      assert(rows(q) === rows(
        ord.groupBy("o_orderstatus").agg(count(lit(1)).as("n"))))
      // full re-check restores the proof
      CheckConstraints.revalidate(st, "fact_fk")
      assert(joinCount(keyOnlyJoin(st)) === 0)
    } finally FkJoinElim.uninstall(spark, rule)
  }

  test("dim-side checked insert advances the ref watermark") {
    val st = scratch()
    st.create("dim", cust.filter(col("c_custkey") % 2 === 0))
    st.create("fact", ord.filter(col("o_custkey") % 2 === 0 &&
      col("o_orderkey") % 3 === 0))
    CheckConstraints.declareUnique(st, "dim", "dim_pk", Seq("c_custkey"))
    CheckConstraints.declareForeignKey(st, "fact", "fact_fk",
      Seq("o_custkey"), "dim", Seq("c_custkey"))
    // growing the REFERENCED side through admission control can never
    // orphan a fact row — the FK's ref watermark advances with it
    CheckConstraints.insert(st, "dim", cust.filter(col("c_custkey") % 2 === 1))
    val rule = FkJoinElim.install(spark, st)
    try assert(joinCount(keyOnlyJoin(st)) === 0)
    finally FkJoinElim.uninstall(spark, rule)
  }

  test("RESTRICT-checked deletes advance the chain; referenced-key deletes refuse") {
    val st = seeded()
    val rule = FkJoinElim.install(spark, st)
    try {
      // fact-side delete can't break the FK: still eliminated
      st.delete("fact", col("o_orderkey") % 9 === 0)
      assert(joinCount(keyOnlyJoin(st)) === 0)
      // dim-side delete of UNREFERENCED keys: restrictDelete proves it
      // safe, the ref watermark advances, still eliminated
      val referenced = st.read("fact").select(col("o_custkey").as("c_custkey"))
      val unref = st.read("dim").join(referenced.distinct(), Seq("c_custkey"), "left_anti")
        .select("c_custkey").collect().map(_.getLong(0)).take(5)
      assume(unref.nonEmpty)
      st.delete("dim", col("c_custkey").isin(unref.toIndexedSeq: _*))
      assert(joinCount(keyOnlyJoin(st)) === 0)
      // deleting a REFERENCED key refuses whole and changes nothing
      val refd = st.read("fact").select("o_custkey").head.getLong(0)
      intercept[CheckConstraints.CheckViolation] {
        st.delete("dim", col("c_custkey") === refd)
      }
      assert(joinCount(keyOnlyJoin(st)) === 0)
    } finally FkJoinElim.uninstall(spark, rule)
  }

  test("validated updates advance the chain") {
    val st = seeded()
    val rule = FkJoinElim.install(spark, st)
    try {
      // a non-key update passes admission and keeps the proof alive
      st.update("fact", Map("o_orderstatus" -> lit("X")),
        col("o_orderkey") % 7 === 0)
      assert(joinCount(keyOnlyJoin(st)) === 0)
      // an fk retarget WITHIN the dim also stays proven
      val anyKey = st.read("dim").select("c_custkey").head.getLong(0)
      st.update("fact", Map("o_custkey" -> lit(anyKey)),
        col("o_orderkey") % 11 === 0)
      assert(joinCount(keyOnlyJoin(st)) === 0)
    } finally FkJoinElim.uninstall(spark, rule)
  }

  test("survives pending deletion vectors on both sides") {
    val st = seeded()
    // fact-side MOR delete: a subset of validated facts keeps the FK;
    // dim-side MOR delete passes restrictDelete only for UNREFERENCED
    // keys, so every surviving fact still meets a live dim row
    st.deleteMor("fact", col("o_orderkey") % 7 === 2)
    val used = st.read("fact").select(col("o_custkey")).distinct()
    val unref = st.read("dim")
      .join(used, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey").limit(20).collect().map(_.getLong(0))
    assert(unref.nonEmpty, "fixture needs customers without orders")
    st.deleteMor("dim", col("c_custkey").isin(unref.toIndexedSeq: _*))
    val expected = rows(keyOnlyJoin(st)) // rule not installed
    val rule = FkJoinElim.install(spark, st)
    try {
      val q = keyOnlyJoin(st)
      assert(joinCount(q) === 0,
        s"the MOR visibility shape must traverse:\n${q.queryExecution.optimizedPlan}")
      assert(rows(q) === expected)
    } finally FkJoinElim.uninstall(spark, rule)
  }

  test("a tombstoned shallow clone must not resolve to its validated source") {
    val st = seeded()
    // the clone shares its source's data dirs (zero-copy) and carries
    // NO constraints; a MOR delete of a REFERENCED key is legal on it
    // — but now its visible rows diverge from dim's while the data-dir
    // sets stay IDENTICAL. Table identity must see the vector set, or
    // the rule resolves this scan to the validated source and
    // eliminates a join whose dim side lost a referenced key.
    st.cloneTable("dim", "dimclone")
    val refd = st.read("fact").select("o_custkey").head.getLong(0)
    st.deleteMor("dimclone", col("c_custkey") === refd)
    def cloneJoin: DataFrame =
      st.read("fact").join(st.read("dimclone"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    val expected = rows(cloneJoin) // rule not installed: the real join
    val rule = FkJoinElim.install(spark, st)
    try {
      val q = cloneJoin
      assert(joinCount(q) === 1,
        s"tombstoned clone misidentified as source:\n${q.queryExecution.optimizedPlan}")
      assert(rows(q) === expected)
      // a PRISTINE clone is bit-identical to its source, so resolving
      // it to the validated source and eliminating IS sound — identity
      // must not be so strict that zero-divergence clones lose the win
      st.cloneTable("dim", "dimclone2")
      val q2 = st.read("fact").join(st.read("dimclone2"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      assert(joinCount(q2) === 0,
        s"pristine clone should still eliminate:\n${q2.queryExecution.optimizedPlan}")
    } finally FkJoinElim.uninstall(spark, rule)
  }

  test("refuses when dim columns beyond the key are used") {
    val st = seeded()
    val rule = FkJoinElim.install(spark, st)
    try {
      val q = st.read("fact").join(st.read("dim"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      assert(joinCount(q) === 1)
    } finally FkJoinElim.uninstall(spark, rule)
  }

  test("refuses without the UNIQUE key proof") {
    val st = scratch()
    st.create("dim", cust)
    st.create("fact", ord.filter(col("o_orderkey") % 3 === 0))
    // FK alone: a duplicate-pk dim would duplicate fact rows
    CheckConstraints.declareForeignKey(st, "fact", "fact_fk",
      Seq("o_custkey"), "dim", Seq("c_custkey"))
    val rule = FkJoinElim.install(spark, st)
    try assert(joinCount(keyOnlyJoin(st)) === 1)
    finally FkJoinElim.uninstall(spark, rule)
  }

  test("kill switch stands the rule down") {
    val st = seeded()
    val rule = FkJoinElim.install(spark, st)
    try {
      spark.conf.set("spark.graft.fkelim.enabled", "false")
      try assert(joinCount(keyOnlyJoin(st)) === 1)
      finally spark.conf.unset("spark.graft.fkelim.enabled")
      assert(joinCount(keyOnlyJoin(st)) === 0)
    } finally FkJoinElim.uninstall(spark, rule)
  }
}
