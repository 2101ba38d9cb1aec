package graft

import org.apache.spark.sql.functions._
import graft.queries.Relational

class RelationalSpec extends SparkSpec {

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs at sf0.001 and every oracle key exists") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    SparkEntry.oracleSql.keys.foreach(k => assert(qs.contains(k), s"oracle without query: $k"))
    qs.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("filter and projection are pushed down to the parquet scan") {
    val plan = Relational.queries("s1_scan_filter")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), "no pushdown block in scan")
    assert(plan.contains("EqualTo(l_returnflag,R)"), s"filter not pushed: $plan")
    assert(!plan.contains("l_extendedprice"), "unprojected column read from scan")
  }

  test("KMV sketches are mergeable: merged sub-sketches equal the direct sketch") {
    // the property that makes KMV the 100 TB shape: per-partition
    // sketches union by re-taking the k smallest of the combined
    // k-min sets, and the result is EXACTLY the sketch of the union —
    // top-k of a union of per-partition top-ks is the global top-k
    val k = 256
    import org.apache.spark.sql.expressions.Window
    val vals = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_returnflag").as("key"), col("l_linestatus").as("sub"),
        col("l_partkey").as("v")).distinct()
      .withColumn("h", expr(
        "CAST(conv(substring(md5(CAST(v AS STRING)), 1, 15), 16, 10) AS BIGINT)"))
    def sketch(df: org.apache.spark.sql.DataFrame, parts: String*) = df
      .withColumn("rn", row_number().over(
        Window.partitionBy(parts.map(col): _*).orderBy("h", "v")))
      .filter(col("rn") <= k)
    // direct: global per-key sketch; merged: per-(key,sub) sketches
    // unioned, then re-taken to k per key. NOTE: the same v can appear
    // under several subs, so the merge dedups hashes first (set union)
    val direct = sketch(vals.select("key", "v", "h").distinct(), "key")
      .groupBy("key").agg(count(lit(1)).as("n_k"), max("h").as("kth"))
    val merged = sketch(
      sketch(vals, "key", "sub").select("key", "v", "h").distinct(), "key")
      .groupBy("key").agg(count(lit(1)).as("n_k"), max("h").as("kth"))
    val d = direct.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val m = merged.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(d == m, s"merged sketch must equal the direct sketch: $d vs $m")
  }

  test("top-k rank filter uses WindowGroupLimit (no full per-group sort)") {
    val plan = Relational.queries("a6_topk_per_group")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
  }

  test("order-by+limit compiles to TakeOrderedAndProject (no global sort)") {
    val plan = Relational.queries("o1_orderby_limit")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k plan in:\n$plan")
  }

  test("broadcast hint produces a broadcast join") {
    val plan = Relational.queries("j8_broadcast_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }

  test("semi and anti joins partition the customers exactly") {
    // j4 anti-joins against the URGENT orders subset (non-vacuous gate
    // rows — round-9); its complement is the semi-join on the SAME
    // subset, and together they partition the customers
    val cust = Tables.t(spark, sf, "customer")
    val urgent = Tables.t(spark, sf, "orders")
      .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
    val semiUrgent = cust.join(urgent,
      cust("c_custkey") === urgent("o_custkey"), "left_semi").count()
    val anti = Relational.queries("j4_not_exists_anti")(spark, sf).count()
    assert(semiUrgent + anti == cust.count())
    assert(anti > 0, "j4 must be non-vacuous at every fixture SF")
  }
}
