package graft

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.store.TableStore

/** Partition evolution ([[graft.store.TableStore.evolvePartitioning]]):
  * the adm18 gate proves read semantics against the DuckDB oracle;
  * these specs pin the physical contract — the evolve commit moves
  * ZERO data (the property that makes re-partitioning a 100 TB table a
  * metadata op), each vintage keeps and reads under its own layout,
  * whole-log rewrites migrate history to the current layout, and
  * compaction never folds a dir across a layout line. */
class PartitionEvolutionSpec extends SparkSpec {

  private def scratch(): TableStore =
    new TableStore(spark, Files.createTempDirectory("graft-pe-").toString)

  private def orders: DataFrame =
    spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))

  private def sortedRows(df: DataFrame): Seq[String] =
    df.select(df.columns.sorted.map(col).toIndexedSeq: _*)
      .collect().map(_.toSeq.mkString("|")).sorted.toSeq

  /** First-level subdir names of a data dir (the partition encoding). */
  private def subdirs(st: TableStore, table: String, dir: String): Seq[String] = {
    val p = Path.of(st.root, table, dir)
    val s = Files.list(p)
    try s.iterator().asScala.filter(Files.isDirectory(_))
      .map(_.getFileName.toString).toSeq
    finally s.close()
  }

  test("evolve is metadata-only; vintages keep and read under their own layout") {
    val st = scratch()
    st.createPartitioned("t", orders.filter(col("o_orderkey") % 2 === 0),
      Seq("o_orderstatus"))
    val oldDirs = st.dataDirs("t")
    st.evolvePartitioning("t", Seq("o_orderpriority"))
    assert(st.dataDirs("t") === oldDirs, "evolve must move zero data")
    assert(st.partitionColumns("t") === Seq("o_orderpriority"))

    st.insert("t", orders.filter(col("o_orderkey") % 2 === 1))
    val newDirs = st.dataDirs("t").filterNot(oldDirs.contains)
    assert(newDirs.size === 1)
    assert(subdirs(st, "t", oldDirs.head).forall(_.startsWith("o_orderstatus=")),
      "pre-evolution dirs keep their physical layout")
    assert(subdirs(st, "t", newDirs.head).forall(_.startsWith("o_orderpriority=")),
      "post-evolution writes land in the new layout")
    assert(sortedRows(st.read("t")) === sortedRows(orders),
      "the mixed-vintage read must see every row exactly once")
  }

  test("filters on either vintage's partition column still answer correctly") {
    val st = scratch()
    st.createPartitioned("t", orders.filter(col("o_orderkey") % 2 === 0),
      Seq("o_orderstatus"))
    st.evolvePartitioning("t", Seq("o_orderpriority"))
    st.insert("t", orders.filter(col("o_orderkey") % 2 === 1))
    assert(st.read("t").filter(col("o_orderstatus") === "F").count() ===
      orders.filter(col("o_orderstatus") === "F").count())
    assert(st.read("t").filter(col("o_orderpriority") === "1-URGENT").count() ===
      orders.filter(col("o_orderpriority") === "1-URGENT").count())
  }

  test("COW delete across vintages rewrites into the current layout") {
    val st = scratch()
    st.createPartitioned("t", orders.filter(col("o_orderkey") % 2 === 0),
      Seq("o_orderstatus"))
    st.evolvePartitioning("t", Seq("o_orderpriority"))
    st.insert("t", orders.filter(col("o_orderkey") % 2 === 1))
    st.delete("t", col("cents") % 9 === 4) // touches both vintages
    assert(sortedRows(st.read("t")) ===
      sortedRows(orders.filter(not(col("cents") % 9 === 4))))
    // every surviving dir must be readable under its recorded layout —
    // the rewrite dir(s) in the current one
    val rewritten = st.dataDirs("t")
    assert(rewritten.nonEmpty)
    assert(subdirs(st, "t", rewritten.last).forall(_.startsWith("o_orderpriority=")),
      "the COW rewrite dir must use the current layout")
  }

  test("the vintage fold migrates history to the current layout") {
    val st = scratch()
    spark.conf.set("spark.graft.store.maxVintageRuns", "1")
    try {
      st.createPartitioned("t", orders.filter(col("o_orderkey") % 3 === 0),
        Seq("o_orderstatus"))
      st.evolvePartitioning("t", Seq("o_orderpriority"))
      // the layout line split the log into 2 runs > cap → this insert
      // folds the pre-existing log into the CURRENT layout
      st.insert("t", orders.filter(col("o_orderkey") % 3 === 1))
      assert(st.dataDirs("t").forall(d =>
        subdirs(st, "t", d).forall(_.startsWith("o_orderpriority="))),
        "the fold must migrate old vintages to the current layout")
      assert(sortedRows(st.read("t")) ===
        sortedRows(orders.filter(col("o_orderkey") % 3 < 2)))
    } finally spark.conf.unset("spark.graft.store.maxVintageRuns")
  }

  test("compaction never folds a dir across the layout line") {
    val st = scratch()
    st.createPartitioned("t", orders.filter(col("o_orderkey") % 4 === 0),
      Seq("o_orderstatus"))
    st.evolvePartitioning("t", Seq("o_orderpriority"))
    st.insert("t", orders.filter(col("o_orderkey") % 4 === 1))
    st.insert("t", orders.filter(col("o_orderkey") % 4 === 2))
    val preEvolution = st.dataDirs("t").head
    val stats = st.compact("t")
    assert(stats.dirsFolded === 2,
      "only the two post-evolution dirs are foldable")
    assert(st.dataDirs("t").contains(preEvolution),
      "the pre-evolution dir must carry by reference, not cross the line")
    assert(sortedRows(st.read("t")) ===
      sortedRows(orders.filter(col("o_orderkey") % 4 < 3)))
  }

  test("un-partitioned tables can evolve INTO a layout") {
    val st = scratch()
    st.create("t", orders.filter(col("o_orderkey") % 2 === 0))
    st.evolvePartitioning("t", Seq("o_orderstatus"))
    st.insert("t", orders.filter(col("o_orderkey") % 2 === 1))
    assert(sortedRows(st.read("t")) === sortedRows(orders))
    val newest = st.dataDirs("t").last
    assert(subdirs(st, "t", newest).forall(_.startsWith("o_orderstatus=")))
  }

  test("evolve refuses unknown columns and no-op layouts") {
    val st = scratch()
    st.createPartitioned("t", orders, Seq("o_orderstatus"))
    intercept[IllegalArgumentException] {
      st.evolvePartitioning("t", Seq("nope"))
    }
    intercept[IllegalArgumentException] {
      st.evolvePartitioning("t", Seq("o_orderstatus"))
    }
  }

  test("deletion vectors keep applying across an evolution") {
    val st = scratch()
    st.createPartitioned("t", orders.filter(col("o_orderkey") % 2 === 0),
      Seq("o_orderstatus"))
    st.deleteMor("t", col("cents") % 5 === 3)
    val expectOld = sortedRows(st.read("t"))
    st.evolvePartitioning("t", Seq("o_orderpriority"))
    st.insert("t", orders.filter(col("o_orderkey") % 2 === 1))
    val got = sortedRows(st.read("t"))
    val want = (expectOld ++ sortedRows(orders.filter(col("o_orderkey") % 2 === 1)))
      .sorted
    assert(got === want, "tombstones must survive the layout change")
  }
}
