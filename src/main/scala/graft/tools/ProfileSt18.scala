package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe of the st18 stream-stream FULL OUTER drain: prints
  * per-batch watermark/state progress and the output split, to pin
  * where the tail unmatched-purchase evictions go. */
object ProfileSt18 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.streaming.EventStreams.streamStreamSignupFullJoin(spark, d)
      .writeStream.outputMode("append").format("memory").queryName("probe")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val prog = q.recentProgress
    println(s"PROBE batches=${prog.length}")
    prog.takeRight(8).foreach(p => println(
      s"PROBE batch=${p.batchId} in=${p.numInputRows} " +
        s"wm=${p.eventTime.get("watermark")} " +
        s"state=${p.stateOperators.headOption.map(_.numRowsTotal)}"))
    val out = spark.table("probe")
    println(s"PROBE out=${out.count()} nullSig=${out.filter(col("signup_id").isNull).count()} " +
      s"nullP=${out.filter(col("p_id").isNull).count()}")
    spark.stop()
  }
}
