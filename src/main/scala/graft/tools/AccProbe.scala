package graft.tools

import org.apache.spark.sql.SparkSession

/** One-shot observability probe: accumulated fixpoint rows for the
  * magic-restricted hq24 vs the full hq21 closure at a given sf dir. */
object AccProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.heroql.Planner.fixpointStatsEnabled = true
    val n24 = graft.queries.HeroQueries.queries("hq24_magic_sets")(spark, d).count()
    val acc24 = graft.heroql.Planner.lastFixpointAccRows
    val full = graft.queries.HeroQueries.queries("hq21_recursive_rule")(spark, d).count()
    val accFull = graft.heroql.Planner.lastFixpointAccRows
    println(s"ACC hq24 result=$n24 acc=$acc24 | hq21 closure=$full accFull=$accFull")
    spark.stop()
  }
}
