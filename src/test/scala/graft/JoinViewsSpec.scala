package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.store.{JoinViews, TableStore, WritePath}

/** Incrementally-maintained JOIN views ([[graft.store.JoinViews]], the
  * delta rule Δ(A⋈B) = ΔA⋈B ∪ A'⋈ΔB): parity with the plain join after
  * every maintenance step, APPEND-ONLY insert maintenance (the view's
  * dir count grows — no rebuild on the hot path), the both-sides-in-
  * one-transaction schedule counting each batch exactly once, the
  * delete → rebuild trade, and the freshness watermark detecting a
  * bypassing write. */
class JoinViewsSpec extends SparkSpec {

  private def scratch(): TableStore =
    new TableStore(spark, Files.createTempDirectory("graft-jv-spec-").toString)

  private def cust: DataFrame =
    spark.read.parquet(s"$sf/customer.parquet").select(
      col("c_custkey").as("o_custkey"), col("c_mktsegment"), col("c_nationkey"))

  private def ord: DataFrame =
    spark.read.parquet(s"$sf/orders.parquet").select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).sorted.toSeq

  private def expect(st: TableStore): Seq[String] =
    sortedRows(st.read("fact").join(st.read("dim"), Seq("o_custkey")))

  private def setUp(st: TableStore): Unit = {
    st.create("dim", cust.filter(col("o_custkey") % 3 === 0))
    st.create("fact", ord.filter(col("o_orderkey") % 4 === 0))
    JoinViews.register(st, "jv", "fact", "dim", Seq("o_custkey"))
  }

  test("insert maintenance on either side appends the exact delta") {
    val st = scratch()
    setUp(st)
    assert(sortedRows(st.read("jv")) === expect(st), "built view != join")
    val dirs0 = st.dataDirs("jv").size

    st.insert("fact", ord.filter(col("o_orderkey") % 4 === 1))
    assert(sortedRows(st.read("jv")) === expect(st), "fact batch diverged")
    st.insert("dim", cust.filter(col("o_custkey") % 3 === 1))
    assert(sortedRows(st.read("jv")) === expect(st), "dim batch diverged")

    // append-only: two maintained inserts added dirs, replaced none
    val dirs2 = st.dataDirs("jv")
    assert(dirs2.size > dirs0,
      s"insert maintenance must append (was $dirs0, now ${dirs2.size})")
    assert(JoinViews.isFresh(st, "jv"), "maintained view must be fresh")
  }

  test("both sides inserted in ONE transaction count each batch once") {
    val st = scratch()
    setUp(st)
    st.transaction { tx =>
      WritePath.insert(tx, "fact", ord.filter(col("o_orderkey") % 4 === 2))
      WritePath.insert(tx, "dim", cust.filter(col("o_custkey") % 3 === 1))
    }
    assert(sortedRows(st.read("jv")) === expect(st),
      "one-txn dual-side maintenance must equal the final join (ΔA⋈B_old" +
        " + A_new⋈ΔB, no double count of ΔA⋈ΔB)")
    assert(JoinViews.isFresh(st, "jv"))
  }

  test("delete/update/upsert rebuild the view to the post-write join") {
    val st = scratch()
    setUp(st)
    st.delete("fact", col("o_orderkey") % 8 === 0)
    assert(sortedRows(st.read("jv")) === expect(st), "delete diverged")
    st.update("dim", Map("c_mktsegment" -> lit("REBUILT")),
      col("o_custkey") % 6 === 0)
    assert(sortedRows(st.read("jv")) === expect(st), "update diverged")
    assert(JoinViews.isFresh(st, "jv"))
  }

  test("a bypassing raw-txn write is detected by the freshness watermark") {
    val st = scratch()
    setUp(st)
    assert(JoinViews.isFresh(st, "jv"))
    st.transaction(_.insert("fact", ord.filter(col("o_orderkey") % 4 === 3)))
    assert(!JoinViews.isFresh(st, "jv"),
      "raw txn insert moved the base manifest; view must report stale")
  }

  test("chained agg view folds the join delta incrementally in-commit") {
    val st = scratch()
    setUp(st)
    graft.store.MaterializedView.register(st, "agg", "jv",
      graft.store.MaterializedView.MvDef(Seq("c_mktsegment"),
        Seq("n_nation" -> "c_nationkey")))
    def recompute(): Seq[String] = sortedRows(
      st.read("fact").join(st.read("dim"), Seq("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_rows"), sum("c_nationkey").as("n_nation")))
    st.insert("fact", ord.filter(col("o_orderkey") % 4 === 1))
    assert(sortedRows(st.read("agg")) === recompute(),
      "chained agg diverged after a fact batch")
    st.insert("dim", cust.filter(col("o_custkey") % 3 === 1))
    assert(sortedRows(st.read("agg")) === recompute(),
      "chained agg diverged after a dim batch")

    // incremental-fold proof: poison the agg view with a sentinel group
    // through a raw txn (which does NOT move the join view's manifest,
    // so the chain's watermark stays in sync). An incremental fold
    // must carry the poison forward; a rebuild would heal it.
    import spark.implicits._
    st.transaction(_.insert("agg",
      Seq(("__POISON__", 1L, 42L)).toDF("c_mktsegment", "n_rows", "n_nation")))
    st.insert("fact", ord.filter(col("o_orderkey") % 4 === 2))
    val seg = st.read("agg").filter(col("c_mktsegment") === "__POISON__")
    assert(seg.count() === 1,
      "maintenance rebuilt the agg view — the chained fold must be " +
        "incremental (poison row should have survived)")
    // ...and a full-rewrite path (delete → join-view rebuild) forces
    // the chained agg rebuild, which heals the poison
    st.delete("fact", col("o_orderkey") % 8 === 0)
    assert(st.read("agg").filter(col("c_mktsegment") === "__POISON__")
      .count() === 0, "join-view rebuild must rebuild the chained agg")
    assert(sortedRows(st.read("agg")) === recompute(),
      "chained agg diverged after the rebuild path")
  }

  test("registration validates keys and non-key disjointness") {
    val st = scratch()
    st.create("dim", cust)
    st.create("fact", ord)
    intercept[IllegalArgumentException] {
      JoinViews.register(st, "bad", "fact", "dim", Seq("no_such_key"))
    }
    st.create("dim2", cust.withColumnRenamed("c_nationkey", "o_orderstatus"))
    intercept[IllegalArgumentException] {
      JoinViews.register(st, "bad2", "fact", "dim2", Seq("o_custkey"))
    }
  }
}
