package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.store.{TableStore, ZOrder}

/** Z-order clustered layout ([[graft.store.ZOrder]]): result parity
  * against the unpruned filter, conservative bucket enumeration, and —
  * the layout's reason to exist — static partition pruning for 2-D,
  * x-only, AND y-only range probes on the SAME table. */
class ZOrderSpec extends SparkSpec {

  private def orders: DataFrame =
    spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .withColumn("o_price_i", expr("CAST(floor(o_totalprice) AS BIGINT)"))

  private def build(): (TableStore, java.nio.file.Path) = {
    val root = Files.createTempDirectory("graft-zorder-spec-")
    val st = new TableStore(spark, root.toString)
    ZOrder.createZOrdered(st, "oz", orders, "o_custkey", "o_price_i", bits = 3)
    (st, root)
  }

  private def scans(p: org.apache.spark.sql.execution.SparkPlan):
      Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
    case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      scans(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
    case r: org.apache.spark.sql.execution.ReusedSubqueryExec => scans(r.child)
    case other => other.children.flatMap(scans)
  }

  private def filesReadVsOnDisk(df: DataFrame,
      root: java.nio.file.Path): (Long, Long) = {
    df.collect() // execute so scan metrics populate
    val read = scans(df.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
    val onDisk = {
      val s = Files.walk(root)
      try s.filter(p => p.getFileName.toString.endsWith(".parquet")).count()
      finally s.close()
    }
    (read, onDisk)
  }

  test("2-D range query: parity with the unpruned filter, pruned read") {
    val (st, root) = build()
    val got = ZOrder.rangeQuery(st, "oz", Some((20L, 80L)), Some((50000L, 200000L)))
    // metric read FIRST: a re-execution of the same plan resets the
    // scan's SQLMetrics, so the files-read count must come from the
    // df's first collect
    val (read, onDisk) = filesReadVsOnDisk(got, root)
    assert(read > 0 && read < onDisk,
      s"2-D probe should prune: read $read of $onDisk files")
    val want = orders.filter(col("o_custkey").between(20, 80) &&
      col("o_price_i").between(50000L, 200000L))
    assert(got.collect().map(_.toSeq.take(3)).toSet ===
      want.collect().map(_.toSeq.take(3)).toSet)
    assert(want.count() > 0, "fixture premise: the rectangle is non-empty")
  }

  test("single-dimension ranges prune too — on BOTH dimensions") {
    val (st, root) = build()
    // tight single-dimension slices: each constrains its own cell
    // coordinate, which z-interleaving turns into a bucket subset
    val xOnly = ZOrder.rangeQuery(st, "oz", Some((20L, 40L)), None)
    val (xr, xd) = filesReadVsOnDisk(xOnly, root)
    assert(xr > 0 && xr < xd, s"x-only probe should prune: $xr of $xd")
    val yOnly = ZOrder.rangeQuery(st, "oz", None, Some((50000L, 80000L)))
    val (yr, yd) = filesReadVsOnDisk(yOnly, root)
    assert(yr > 0 && yr < yd, s"y-only probe should prune: $yr of $yd")
    // parity for both
    assert(xOnly.collect().map(_.getLong(0)).toSet ===
      orders.filter(col("o_custkey").between(20, 40))
        .collect().map(_.getLong(0)).toSet)
    assert(yOnly.collect().map(_.getLong(0)).toSet ===
      orders.filter(col("o_price_i").between(50000L, 80000L))
        .collect().map(_.getLong(0)).toSet)
  }

  test("bucket enumeration is conservative under out-of-domain bounds") {
    val (st, _) = build()
    // a box stretching far past the data domain clamps to edge cells
    // and must still return every matching row
    val got = ZOrder.rangeQuery(st, "oz",
      Some((-1000000L, 1000000L)), Some((Long.MinValue / 4, Long.MaxValue / 4)))
    assert(got.count() === orders.count(),
      "an all-covering box must return the whole table")
  }

  test("unconstrained probe keeps every bucket; tight probe keeps few") {
    val (st, _) = build()
    val props = st.tableProps("oz")
    val all = ZOrder.keptBuckets(props, None, None)
    assert(all.size === 64, s"bits=3 → 64 buckets, got ${all.size}")
    val tight = ZOrder.keptBuckets(props, Some((20L, 40L)), Some((50000L, 80000L)))
    assert(tight.size < 64 && tight.nonEmpty,
      s"tight box should keep a strict subset: ${tight.size}")
  }
}
