package graft

import org.apache.spark.sql.functions._

/** The skew escape hatch for the dedup keeper aggregation
  * (`spark.graft.dedup.saltBuckets`): a 100×-replicated hot key must
  * produce identical keepers through the two-level salted path, with
  * the hot key genuinely spread across salt buckets at level 1. */
class SaltedAggSpec extends SparkSpec {

  private def corpus = {
    // one viral text under 100 distinct ids + 50 singleton texts —
    // the pathological shape: every hot row targets ONE reduce group
    // in a plain groupBy(key)
    val hot = spark.range(100).select(
      (col("id") + 1000L).as("doc_id"), lit("viral boilerplate").as("text"),
      lit("en").as("lang"), lit(3L).as("n_tok"), lit(0.9).as("quality"))
    val cold = spark.range(50).select(
      col("id").as("doc_id"), concat(lit("doc-"), col("id")).as("text"),
      lit("de").as("lang"), lit(5L).as("n_tok"), lit(0.8).as("quality"))
    hot.unionByName(cold)
  }

  test("salted keeper agg equals the unsalted result on a 100x hot key") {
    val docs = corpus
    val plain = graft.queries.PipelineQueries.keeperAgg(spark, docs, "text")
      .collect().map(_.toSeq).toSet
    spark.conf.set("spark.graft.dedup.saltBuckets", "8")
    try {
      val salted = graft.queries.PipelineQueries.keeperAgg(spark, docs, "text")
      assert(salted.collect().map(_.toSeq).toSet == plain,
        "salted two-level keepers diverge from the single-level result")
      assert(plain.size == 51, "one keeper per distinct text")
      // first-arrival semantics survive the salt: min doc_id wins
      val hotKeeper = salted.filter(col("text") === "viral boilerplate")
        .select("doc_id").head.getLong(0)
      assert(hotKeeper == 1000L, "hot-key keeper is not the min doc_id")
    } finally spark.conf.unset("spark.graft.dedup.saltBuckets")
  }

  test("the hot key spreads across salt buckets and the plan carries the salt") {
    val docs = corpus
    spark.conf.set("spark.graft.dedup.saltBuckets", "8")
    try {
      val salted = graft.queries.PipelineQueries.keeperAgg(spark, docs, "text")
      // level-1 exchange must partition on (text, __salt) — that IS the
      // skew fix: the hot key no longer hashes to a single reducer
      val plan = salted.queryExecution.executedPlan.toString
      assert(plan.contains("__salt"),
        s"salted plan has no __salt partitioning:\n$plan")
      // the 100 hot rows really land in multiple level-1 reduce groups
      val spread = docs
        .withColumn("__salt", pmod(xxhash64(col("doc_id")), lit(8)))
        .filter(col("text") === "viral boilerplate")
        .select("__salt").distinct().count()
      assert(spread >= 4, s"hot key occupies only $spread of 8 salt buckets")
    } finally spark.conf.unset("spark.graft.dedup.saltBuckets")
  }

  test("salt off by default: single-exchange keeper plan") {
    val salted = graft.queries.PipelineQueries.keeperAgg(spark, corpus, "text")
    assert(!salted.queryExecution.executedPlan.toString.contains("__salt"),
      "keeper agg salted without the conf being set")
  }
}
