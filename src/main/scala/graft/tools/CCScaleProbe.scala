package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale comparison of the two CC implementations — GraphX Pregel vs
  * the all-DataFrame large-star/small-star — on synthetic graphs big
  * enough that per-round planning constants stop dominating: chained
  * duplicate clusters (the dd7 shape at production volume). Usage:
  * `runMain graft.tools.CCScaleProbe [nEdges]`. */
object CCScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("cc-scale").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.graft.cc.debug", "true")
    // n edges: 80% short chains (clusters of ~8), 20% random long links
    // inside a 10-cluster giant component — both CC shapes at once
    val edges = spark.range(n).select(
      when(col("id") % 5 =!= 0,
        // chain edge inside cluster id/8: node k -> k+1
        struct(col("id").as("src"), (col("id") + 1).as("dst")))
        .otherwise(struct((col("id") % 10).as("src"),
          pmod(hash(col("id")).cast("long"), lit(n)).as("dst"))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .localCheckpoint()
    println(s"[cc-scale] edges = ${edges.count()}")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cc-scale] $label%-12s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val df = time("dataframe") {
      graft.operators.GraphOps.connectedComponentsDF(spark, edges)
        .agg(count(lit(1)), countDistinct(col("component"))).head
    }
    val gx = time("graphx") {
      graft.operators.GraphOps.connectedComponents(spark, edges)
        .agg(count(lit(1)), countDistinct(col("component"))).head
    }
    println(s"[cc-scale] df=(${df.getLong(0)}, ${df.getLong(1)}) gx=(${gx.getLong(0)}, ${gx.getLong(1)})")
    require(df == gx, "label summaries must agree")
    spark.stop()
  }
}
