package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Driver-side microbenchmark of the verify probe arithmetic over the
  * REAL candidate distribution at sf0.1 — separates the per-pair
  * intersect cost from Spark's per-row machinery when profiling the
  * dd14c verify floor. */
object ProbeMicro {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = graft.Tables.t(spark, d, "documents")
      .select(col("doc_id"), col("text"))
    val reps = graft.queries.Dedup.fpCollapse(docs).localCheckpoint()
    val repDocs = docs.join(reps.select(col("rep_id")),
      docs("doc_id") === col("rep_id")).select(col("doc_id"), col("text"))
    val (as, bs) = graft.operators.MinHashLSH.coeffs(63)
    graft.functions.VectorFns.register(spark, as, bs)
    val sigs = repDocs.repartition(32)
      .withColumn("h", expr("graft_shingle_hashes_md5(text, 5)"))
      .filter(size(col("h")) > 0)
      .withColumn("_mh", expr("graft_minhash_sig_long(h)"))
      .select(col("doc_id"), col("h"), col("_mh")).localCheckpoint()
    def banded(idAs: String) = sigs.select(col("doc_id").as(idAs), explode(expr(
      """transform(sequence(0, 20),
            bi -> struct(bi AS band,
              array_join(transform(slice(_mh, bi * 3 + 1, 3),
                x -> CAST(x AS STRING)), ':') AS sig))""")).as("b"))
      .select(col(idAs), col("b.band"), col("b.sig"))
    val cand = banded("a_id").join(banded("b_id"), Seq("band", "sig"))
      .filter(col("a_id") < col("b_id")).select("a_id", "b_id")
      .as[(Long, Long)].collect()
    println(s"pairs: ${cand.length}")
    val rows = sigs.select(col("doc_id"), col("h"))
      .as[(Long, Array[Long])].collect()
    println(s"docs: ${rows.length}  avg |h|: ${rows.map(_._2.length.toLong).sum / rows.length}")
    val m = graft.functions.VectorFns.IdHashesMap.build(rows)
    (1 to 3).foreach { r =>
      val t0 = System.nanoTime()
      var i = 0; var kept = 0; var sum = 0.0
      while (i < cand.length) {
        val j = m.jaccard(cand(i)._1, cand(i)._2, 0.25)
        if (j >= 0.25) { kept += 1; sum += j }
        i += 1
      }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"round $r: $dt%.3f s single-threaded, ${dt * 1e9 / cand.length}%.0f ns/pair, kept=$kept")
    }
    spark.stop()
  }
}
