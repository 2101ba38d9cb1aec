package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.store.TableStore

/** Row-level change feed ([[graft.store.TableStore.changeFeed]]) and
  * its interplay with merge-on-read deletes: the adm19 gate proves the
  * end-to-end replica replay against the DuckDB oracle; these specs
  * pin the contract edges — the insert-only feed must REFUSE once MOR
  * deletes enter a window (silent divergence is the failure mode that
  * matters), in-window insert+delete emits both records, and vector
  * FOLDS (which rename `@dv` dirs while preserving their rows) must
  * not fabricate deltas because the diff is row-level. */
class CdcFeedSpec extends SparkSpec {

  private def scratch(): TableStore =
    new TableStore(spark, Files.createTempDirectory("graft-cdc-").toString)

  private def orders: DataFrame =
    spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).sorted.toSeq

  test("changesSince refuses a window containing MOR deletes") {
    val st = scratch()
    st.create("t", orders)
    st.insert("t", orders.limit(0))
    st.deleteMor("t", col("o_orderkey") % 5 === 0)
    val e = intercept[IllegalArgumentException] { st.changesSince("t", 2) }
    assert(e.getMessage.contains("merge-on-read"))
    assert(e.getMessage.contains("changeFeed"))
  }

  test("feed replay converges a replica across inserts and MOR deletes") {
    val st = scratch()
    st.create("src", orders.filter(col("o_orderkey") % 3 === 0))
    st.create("rep", st.read("src"))
    st.insert("src", orders.filter(col("o_orderkey") % 3 === 1))
    st.deleteMor("src", col("cents") % 7 === 2)
    st.insert("src", orders.filter(col("o_orderkey") % 3 === 2))
    val feed = st.changeFeed("src", 3).localCheckpoint()
    st.insert("rep",
      feed.filter(col("_change_type") === "insert").drop("_change_type"))
    st.deleteMorMatching("rep",
      feed.filter(col("_change_type") === "delete").drop("_change_type"),
      Seq("o_orderkey"))
    assert(sortedRows(st.read("rep")) === sortedRows(st.read("src")))
  }

  test("in-window insert+delete emits BOTH records; replay still converges") {
    val st = scratch()
    st.create("src", orders.filter(col("o_orderkey") <= 100))
    st.create("rep", st.read("src"))
    st.insert("src", orders.filter(
      col("o_orderkey") > 100 && col("o_orderkey") <= 200))
    // hits old AND new rows — the new ones were inserted in-window
    st.deleteMor("src", col("o_orderkey") % 2 === 0)
    val feed = st.changeFeed("src", 2).localCheckpoint()
    val ins = feed.filter(col("_change_type") === "insert")
    val del = feed.filter(col("_change_type") === "delete")
    // raw in-window inserts: all of 101..200, including later victims
    assert(ins.count() ===
      orders.filter(col("o_orderkey") > 100 && col("o_orderkey") <= 200).count())
    assert(del.filter(col("o_orderkey") > 100).count() > 0,
      "an in-window insert later deleted must emit its delete record")
    st.insert("rep", ins.drop("_change_type"))
    st.deleteMorMatching("rep", del.drop("_change_type"), Seq("o_orderkey"))
    assert(sortedRows(st.read("rep")) === sortedRows(st.read("src")))
  }

  test("vector folds don't fabricate deltas: the diff is row-level") {
    val st = scratch()
    st.create("t", orders)
    st.deleteMor("t", col("o_orderkey") % 50 === 0)
    st.deleteMor("t", col("o_orderkey") % 50 === 1)
    // 7 in-window deletes; the last trips the MaxDvEntries fold, which
    // rewrites EVERY vector (old rows included) into one new dir
    (2 to 8).foreach(i => st.deleteMor("t", col("o_orderkey") % 50 === i))
    assert(st.deletionVectorDirs("t").size < 9, "precondition: a fold ran")
    val feed = st.changeFeed("t", 7)
    assert(feed.filter(col("_change_type") === "insert").count() === 0L)
    val del = feed.filter(col("_change_type") === "delete")
    assert(del.filter(col("o_orderkey") % 50 < 2).count() === 0L,
      "pre-window tombstones must not resurface as deltas after the fold")
    assert(del.count() ===
      orders.filter(col("o_orderkey") % 50 >= 2 &&
        col("o_orderkey") % 50 <= 8).count())
  }

  test("changeFeed refuses copy-on-write windows") {
    val st = scratch()
    st.create("t", orders)
    st.delete("t", col("o_orderkey") % 2 === 0)
    val e = intercept[IllegalArgumentException] { st.changeFeed("t", 1) }
    assert(e.getMessage.contains("copy-on-write"))
  }
}
