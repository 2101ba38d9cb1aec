package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

/** File-source plumbing: partition pruning must reach the scan (at
  * scale, the pruned partitions are never listed, let alone read) and
  * the streaming store sink must commit once per micro-batch. */
class SourceSpec extends SparkSpec {

  test("hive-partitioned write + filtered read prunes partitions in the scan") {
    val dir = Files.createTempDirectory("graft-prune-").toString + "/orders"
    graft.Tables.t(spark, sf, "orders")
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("o_orderstatus") === "F")
    val scans = q.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    assert(scans.head.partitionFilters.nonEmpty,
      s"partition filter missing from scan: ${q.queryExecution.executedPlan}")
    // only the matching partition's rows are read
    val statuses = graft.Tables.t(spark, sf, "orders")
      .groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(q.count() == statuses("F"))
  }

  test("ORC round-trip pushes the row-level predicate into the ORC scan") {
    val dir = Files.createTempDirectory("graft-orc-spec-").toString + "/lineitem"
    graft.Tables.t(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").orc(dir)
    val q = spark.read.orc(dir).filter(col("l_quantity") > 25.0)
    val scans = q.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    // the predicate must reach the ORC reader (stripe-skipping at
    // scale), not evaluate only post-scan
    assert(scans.head.metadata.get("PushedFilters")
      .exists(f => f.contains("GreaterThan(l_quantity")),
      s"predicate not pushed to ORC: ${scans.head.metadata.get("PushedFilters")}")
    // and the round-trip is lossless
    val want = graft.Tables.t(spark, sf, "lineitem")
      .filter(col("l_quantity") > 25.0).count()
    assert(q.count() == want)
  }

  test("streaming store sink commits per micro-batch and lands every row") {
    val store = new graft.store.TableStore(spark,
      Files.createTempDirectory("graft-sink-spec-").toString)
    val got = graft.streaming.EventStreams.sinkToStore(spark, sf, store, "ev")
    val want = spark.read.parquet(s"$sf/events.parquet").count()
    assert(got.count() == want)
    // one atomic commit per micro-batch (maxFilesPerTrigger=1, single
    // staged file -> at least one commit; every commit is a full manifest)
    assert(store.commitCount() >= 1)
    assert(store.read("ev").count() == want)
  }
}
