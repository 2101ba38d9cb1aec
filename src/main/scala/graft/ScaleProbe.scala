package graft

import org.apache.spark.sql.SparkSession

/** Scale-curve probe: run a subset of SparkEntry.queries against an
  * arbitrary warehouse dir (e.g. a locally synthesized 10× documents
  * set) and print per-query seconds — evidence that the LSH paths scale
  * sub-quadratically while the exact all-pairs baselines do not.
  *
  * Usage: runMain graft.ScaleProbe <sfDir> <query> [query...]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect() // warmup
    val times = names.map { n =>
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(n)(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      s""""$n":{"sec":$sec,"rows":$rows}"""
    }
    println(times.mkString("{\"probe\":{", ",", s"},\"dir\":\"$dir\"}"))
    spark.stop()
  }
}
