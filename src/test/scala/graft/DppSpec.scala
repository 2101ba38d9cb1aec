package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

import graft.store.TableStore

/** Dynamic partition pruning through a store-partitioned join (the
  * j14 gate's plan contract): when the fact side is partitioned on the
  * join key and the dim side carries a selective filter, Spark must
  * turn the dim's broadcast into a runtime partition filter on the
  * fact scan — the star-schema mechanism that keeps a 100 TB fact
  * table from being scanned whole. The spec pins BOTH the plan shape
  * (a `dynamicpruning` expression on the scan's partition filters) and
  * its effect (the scan reads strictly fewer partitions than the
  * table holds, and exactly the matching ones).
  */
class DppSpec extends SparkSpec {

  private def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
    case s: QueryStageExec => allScans(s.plan)
    case f: FileSourceScanExec => Seq(f)
    case other => other.children.flatMap(allScans)
  }

  test("a partition-keyed join prunes the fact scan at runtime") {
    val st = new TableStore(spark,
      Files.createTempDirectory("graft-dpp-spec-").toString)
    st.createPartitioned("ev",
      graft.streaming.EventStreams.normalizeTs(
        spark.read.parquet(s"$sf/events.parquet"))
        .select(col("event_id"), col("event_type"), col("value")),
      Seq("event_type"))
    import spark.implicits._
    // file-backed dim: an inline local relation would constant-fold its
    // filter away and DPP's selective-predicate probe would see nothing
    st.create("dim", Seq(("view", "browse"), ("click", "browse"),
      ("purchase", "buy"), ("signup", "acct"), ("error", "ops"))
      .toDF("event_type", "category"))

    val joined: DataFrame =
      st.read("ev")
        .join(st.read("dim").filter(col("category") === "browse"), "event_type")
        .groupBy("event_type").agg(count(lit(1)).as("n"))
    val rows = joined.collect()
    assert(rows.map(_.getString(0)).toSet == Set("view", "click"),
      "join must keep exactly the browse-category types")

    // plan contract: the fact scan carries a dynamic pruning subquery
    // on its PARTITION filters (not a static literal filter)
    val scans = allScans(joined.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("graft-dpp-spec-")))
    assert(scans.nonEmpty, "no store scan found in:\n" +
      joined.queryExecution.executedPlan)
    val pruned = scans.filter(_.partitionFilters.exists(
      _.find(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]).isDefined))
    assert(pruned.nonEmpty,
      "fact scan has no dynamicpruning partition filter:\n" +
        scans.map(s => s.partitionFilters.mkString(", ")).mkString("\n") +
        "\n" + joined.queryExecution.executedPlan)

    // effect contract: of 5 on-disk partitions, the pruned scan read 2
    val partsRead = pruned.map(_.metrics("numPartitions").value).sum
    assert(partsRead == 2L,
      s"expected the scan to read exactly the 2 matching partitions, read $partsRead")
  }
}
