package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Minimal repro of the st18 heartbeat miss: stage the REAL events
  * fixture exactly like EventStreams.stageDir (Files.copy of the
  * single parquet file), append two heartbeat part files, then
  * stream-count the dir standalone. */
object ProbeFileStream {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = java.nio.file.Paths.get("/root/testdata/sf0.01/events.parquet")
    val stage = java.nio.file.Files.createTempDirectory("probe-fs2-")
    java.nio.file.Files.copy(src, stage.resolve("events.parquet"))
    val dir = stage.toString
    val schema = spark.read.parquet(dir).schema
    println(s"PROBE tsType=${schema("ts").dataType}")
    val one = spark.read.parquet(dir).orderBy(col("ts").desc).limit(1)
    def heartbeat(days: Long): Unit = {
      val hb = (schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          one.withColumn("ts", col("ts") + lit(days * 86400L * 1000000000L))
        case _ => one.withColumn("ts", col("ts") + expr(s"INTERVAL $days DAYS"))
      }).withColumn("event_type", lit("wm_heartbeat"))
      hb.coalesce(1).write.mode("append").parquet(dir)
    }
    heartbeat(30)
    heartbeat(31)
    println(s"PROBE batchRead=${spark.read.schema(schema).parquet(dir).count()}")
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .writeStream.outputMode("append").format("memory").queryName("p")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    q.recentProgress.foreach(p => println(
      s"PROBE batch=${p.batchId} in=${p.numInputRows}"))
    println(s"PROBE streamed=${spark.table("p").count()}")
    spark.stop()
  }
}
