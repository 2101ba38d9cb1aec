package graft

import org.apache.spark.sql.functions._

/** Physical-schema drift hardening for the embedding column — the r10
  * lesson (events.ts changed INT64-nanos → timestamp[us] under
  * unchanged code and six gates vanished at analysis time) applied to
  * the OTHER typed physical column the warehouse ships: if a driver
  * round regenerates `embeddings.parquet` with `double[]` elements,
  * every vector expression must keep planning and produce the same
  * neighbors, not throw DATATYPE_MISMATCH. */
class VecAdapterSpec extends SparkSpec {

  private lazy val doubleDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-vec-double-").toString
    spark.read.parquet(s"$sf/embeddings.parquet")
      .withColumn("embedding", col("embedding").cast("array<double>"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("graft_dot_f plans and evaluates on double[] (and mixed) input") {
    graft.functions.VectorFns.register(spark)
    val d = spark.read.parquet(s"$doubleDir/embeddings.parquet")
    val f = spark.read.parquet(s"$sf/embeddings.parquet")
    val dd = d.selectExpr("vec_id", "graft_dot_f(embedding, embedding) AS n2")
      .orderBy("vec_id").limit(5).collect()
    val ff = f.selectExpr("vec_id", "graft_dot_f(embedding, embedding) AS n2")
      .orderBy("vec_id").limit(5).collect()
    dd.zip(ff).foreach { case (a, b) =>
      assert(math.abs(a.getDouble(1) - b.getDouble(1)) < 1e-4,
        s"norms diverged: ${a.getDouble(1)} vs ${b.getDouble(1)}")
    }
    // mixed: float side joined against double side still plans
    val mixed = f.select(col("vec_id"), col("embedding").as("ef"))
      .join(d.select(col("vec_id"), col("embedding").as("ed")), "vec_id")
      .selectExpr("graft_dot_f(ef, ed) AS dot").limit(3).collect()
    assert(mixed.forall(!_.isNullAt(0)))
  }

  test("ann1 and ann4 run against a double[] warehouse with matching neighbors") {
    val exactF = graft.queries.Similarity.queries("ann1_bruteforce_topk")(spark, sf)
      .select("probe_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactD = graft.queries.Similarity.queries("ann1_bruteforce_topk")(spark, doubleDir)
      .select("probe_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // float→double widening is exact, so the cosine ORDER is identical
    assert(exactD == exactF, "double[] warehouse changed exact neighbors")
    val pq = graft.queries.Similarity.queries("ann4_pq_adc_topk")(spark, doubleDir)
      .collect()
    assert(pq.length == exactF.size, s"ann4 row count ${pq.length}")
  }
}
