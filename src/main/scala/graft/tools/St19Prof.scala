package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures st19's drain at several streaming state-partition counts
  * (guide §1: measure before touching config). The streaming aggregate
  * inherits spark.sql.shuffle.partitions at query start; each micro
  * batch then runs one state-store task per partition, so an
  * over-fanned count taxes every batch with empty-partition state
  * commits. */
object St19Prof {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val ckptRoot = java.nio.file.Files
      .createTempDirectory("graft-st19prof-ckpt-").toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.streaming.checkpointLocation", ckptRoot)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    Seq(cpus.toInt, 16, 8, 4, 8, cpus.toInt).foreach { parts =>
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries("st19_stream_kmv_distinct")(spark, d).count()
        println(f"st19 parts=$parts%-3d rep=$rep rows=$n ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
