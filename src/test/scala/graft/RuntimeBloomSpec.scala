package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — the shuffle-reduction lever for
  * selective joins at cluster scale: when one side of a shuffle join is
  * filtered hard (an URGENT-priority dimension slice), Catalyst's
  * InjectRuntimeFilter can build a bloom filter from the filtered side
  * and apply `might_contain` on the probe side BEFORE its shuffle, so
  * the exchange carries only rows that can possibly match.
  *
  * Locally the optimization is latent: the application-side scan
  * threshold defaults to 10 GB precisely so small inputs skip the
  * sketch overhead. This spec pins (a) the exact conf recipe that
  * arms it for a 100 TB deployment, (b) that the filter actually
  * injects into OUR join shapes on Spark 4, and (c) result parity
  * with the optimization off — so the cluster profile can flip it on
  * with evidence, not hope. */
class RuntimeBloomSpec extends SparkSpec {

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def selectiveJoin = {
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
  }

  test("bloom filter injects on the probe side under the cluster conf profile") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // local inputs are far below the 10 GB default scan threshold —
      // zero it to observe the cluster-scale behavior
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // broadcast joins don't need the bloom (the build side ships
      // whole); force the shuffle-join planning the 100 TB join gets
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    ) {
      val plan = selectiveJoin.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected:\n${plan.take(2000)}")
    }
  }

  test("bloom-armed join returns exactly the unarmed rows") {
    val expected = selectiveJoin.count()
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    ) {
      assert(selectiveJoin.count() == expected,
        "bloom pruning changed the join result — false negatives are impossible by construction, so this is a conf bug")
    }
  }
}
