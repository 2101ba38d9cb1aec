package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-split profile for g3 (PageRank): graph build vs iterations.
  * Ad-hoc diagnostic main (round-7 VERDICT item 4); prints one JSON
  * line with cold/warm timings of each phase at the bench config. */
object ProfileG3 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val results = (1 to 3).map { _ =>
      val edges = spark.read.parquet(s"$sfDir/part.parquet")
        .select(col("p_partkey").as("src"), expr("p_partkey div 2").as("dst"))
        .filter(col("dst") >= 1)
      val (g, tBuild) = time {
        val g = graft.operators.GraphOps.fromEdges(edges)
        g.edges.count(); g.vertices.count() // force build + persist
        g
      }
      val (_, tIters) = time {
        g.staticPageRank(3, 0.15).vertices.count()
      }
      g.unpersist()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      (tBuild, tIters)
    }
    val js = results.map { case (b, i) => f"""{"build":$b%.3f,"iters":$i%.3f}""" }
      .mkString("[", ",", "]")
    println(s"""{"g3_phase_split":$js}""")
    spark.stop()
  }
}
