package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Variant-split profile for st5b (fp-keyed streaming dedup): isolates
  * where the wall time goes by running, in one warm session, a no-op
  * streaming sink (pure availableNow machinery), the text sink (st5),
  * and the fp sink under bloom-on / bloom-off / small-bloom configs.
  * Ad-hoc diagnostic main; prints one JSON line. */
object ProfileSt5b {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime(); f.count(); (System.nanoTime() - t0) / 1e9
    }
    def freshStore() = new graft.store.TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-prof-store-").toString)

    // warm the streaming machinery once so every variant measures warm
    graft.streaming.DocStreams.dedupSinkToStore(spark, sfDir, freshStore(), "w")

    def noop(): DataFrame = {
      val schema = spark.read.parquet(s"$sfDir/documents.parquet").schema
      val staged = spark.read.parquet(s"$sfDir/documents.parquet")
      val dir = java.nio.file.Files.createTempDirectory("graft-prof-noop-")
      staged.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/documents.parquet")
      val q = src.writeStream
        .foreachBatch((b: DataFrame, _: Long) => { b.count(); () })
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-prof-ckpt-").toString)
        .start()
      q.awaitTermination()
      spark.read.parquet(s"$dir/documents.parquet")
    }

    val phases = Seq(
      "noop_stream" -> (() => noop()),
      "st5_text" -> (() => graft.streaming.DocStreams
        .dedupSinkToStore(spark, sfDir, freshStore(), "t")),
      "st5b_bloom_default" -> (() => graft.streaming.DocStreams
        .dedupSinkToStoreByFp(spark, sfDir, freshStore(), "f1")),
      "st5b_bloom_off" -> { () =>
        spark.conf.set("spark.graft.dedup.bloomEnabled", "false")
        try graft.streaming.DocStreams
          .dedupSinkToStoreByFp(spark, sfDir, freshStore(), "f2")
        finally spark.conf.unset("spark.graft.dedup.bloomEnabled")
      },
      "st5b_bloom_50k" -> { () =>
        spark.conf.set("spark.graft.dedup.bloomExpectedItems", "50000")
        try graft.streaming.DocStreams
          .dedupSinkToStoreByFp(spark, sfDir, freshStore(), "f3")
        finally spark.conf.unset("spark.graft.dedup.bloomExpectedItems")
      },
    )
    val out = phases.map { case (name, f) =>
      val samples = (1 to 2).map(_ => time(f())).min
      f""""$name":$samples%.3f"""
    }
    println(out.mkString("{", ",", s""","dir":"$sfDir"}"""))
    spark.stop()
  }
}
