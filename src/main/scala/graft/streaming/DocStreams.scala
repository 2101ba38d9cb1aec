package graft.streaming

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming document-pipeline transforms: the streaming form of the
  * incremental dedup ladder ([[graft.queries.Dedup]] dd6) — documents
  * arrive in micro-batches and each batch is deduplicated against
  * everything already ingested BEFORE it lands.
  *
  * Dedup state lives in the TABLE STORE, not the streaming state store:
  * the corpus of kept texts IS the state, so it survives restarts, is
  * unbounded (no watermark eviction — a dup is a dup forever), and is
  * readable mid-stream by any other query. At 100 TB the per-batch
  * anti-join would run against a bucketed fingerprint column (or a
  * bloom-filter pushdown) instead of raw text — the join shape is the
  * same.
  */
object DocStreams {

  /** Stage `documents.parquet` as `nFiles` doc_id-range chunks with
    * ascending names AND mtimes: the file source (latestFirst=false)
    * processes oldest-first, so arrival order is doc_id order — which
    * makes "first arrival wins" equal "min doc_id wins", the property
    * the deterministic oracle needs. */
  private def stageOrderedDocs(spark: SparkSession, dir: String, nFiles: Int): String = {
    val stage = Files.createTempDirectory("graft-docstream-")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val maxId = docs.agg(max("doc_id")).head.getLong(0)
    val step = maxId / nFiles + 1
    (0 until nFiles).foreach { k =>
      val part = docs.filter(col("doc_id") >= k * step && col("doc_id") < (k + 1) * step)
      val tmp = Files.createTempDirectory("graft-docstream-part-")
      part.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      // Files.list holds a directory fd until the stream is closed —
      // drain under try/finally (same contract as TableStore.listDir)
      val parquetFile = {
        val written = Files.list(tmp)
        try {
          var found: java.nio.file.Path = null
          val it = written.iterator()
          while (it.hasNext) {
            val p = it.next()
            if (p.getFileName.toString.endsWith(".parquet")) found = p
          }
          found
        } finally written.close()
      }
      val dest = stage.resolve(f"chunk-$k%04d.parquet")
      Files.move(parquetFile, dest)
      Files.setLastModifiedTime(dest, FileTime.fromMillis(1_000_000_000L + k * 60_000L))
    }
    stage.toString
  }

  /** Streaming incremental dedup into the table store: each micro-batch
    * keeps one row per text (min doc_id within the batch), drops texts
    * the store corpus already holds (left_anti against the committed
    * table — reading ONLY the text column, so the scan prunes to one
    * column at any width), and appends the novel rows in one atomic
    * commit. `availableNow` drains the staged chunks, then the committed
    * deduplicated corpus is returned. */
  def dedupSinkToStore(spark: SparkSession, dir: String,
      store: graft.store.TableStore, table: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val staged = stageOrderedDocs(spark, dir, nFiles = 4)
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(staged)
    val q = src.select("doc_id", "text", "lang", "n_chars")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val firstPerText = batch.groupBy("text").agg(
          min("doc_id").as("doc_id"),
          expr("min_by(lang, doc_id)").as("lang"),
          expr("min_by(n_chars, doc_id)").as("n_chars"))
          .select("doc_id", "text", "lang", "n_chars")
        val novel =
          if (store.exists(table))
            firstPerText.join(store.read(table).select("text"), Seq("text"), "left_anti")
          else firstPerText
        if (store.exists(table)) store.insert(table, novel)
        else store.create(table, novel)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("graft-dedup-ckpt-").toString)
      .start()
    q.awaitTermination()
    store.read(table)
  }

  /** Fingerprint-keyed streaming incremental dedup — the 100 TB shape
    * of [[dedupSinkToStore]]: each batch fingerprints its texts map-side
    * (tx4's rolling hash), keeps min doc_id per fingerprint within the
    * batch, and anti-joins the COMMITTED CORPUS'S STORED `fp` COLUMN —
    * 8 bytes per corpus row through the scan and the join instead of
    * ~KB of raw text, and the corpus is never re-hashed (its
    * fingerprints were computed once, on ingest). */
  def dedupSinkToStoreByFp(spark: SparkSession, dir: String,
      store: graft.store.TableStore, table: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val staged = stageOrderedDocs(spark, dir, nFiles = 4)
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(staged)
    val q = src.select("doc_id", "text", "lang", "n_chars")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val firstPerFp = batch
          .withColumn("fp", graft.operators.TextFns.fingerprint("text"))
          .groupBy("fp").agg(
            min("doc_id").as("doc_id"),
            expr("min_by(lang, doc_id)").as("lang"),
            expr("min_by(n_chars, doc_id)").as("n_chars"))
          .select("doc_id", "fp", "lang", "n_chars")
        val novel =
          if (store.exists(table))
            firstPerFp.join(store.read(table).select("fp"), Seq("fp"), "left_anti")
          else firstPerFp
        if (store.exists(table)) store.insert(table, novel)
        else store.create(table, novel)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("graft-dedup-fp-ckpt-").toString)
      .start()
    q.awaitTermination()
    store.read(table)
  }
}
