package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata (builder-prompt scope; the reference has no media
  * surface).
  *
  * The Spark-side plumbing is real — schema, partitioning, batched
  * per-partition processing, frame-sample explosion; the actual codec
  * work is STUBBED with a deterministic fake (this container has no
  * image/audio libraries): `decodeStub` derives "pixels" from the bytes
  * with a rolling hash so tests are reproducible. At deployment the stub
  * body is the only thing to replace (swap `fakeDecode` for a JNI/
  * library call); everything around it — `mapPartitions` batching so the
  * codec is initialized once per partition, not once per row, binary
  * columns staying off the shuffle until after filtering — stays.
  */
object Multimodal {

  /** Typed metadata carried beside every media blob. */
  final case class MediaMeta(
      mediaType: String, // "image" | "audio" | "video"
      width: Int,
      height: Int,
      durationMs: Long)

  final case class MediaRow(media_id: Long, meta: MediaMeta, payload: Array[Byte])

  final case class DecodedFeatures(
      media_id: Long,
      n_bytes: Long,
      checksum: Long,
      feature: Array[Float])

  /** Build a media table from the documents fixture: payload = UTF-8
    * bytes of the text, metadata derived deterministically. Stands in
    * for `spark.read.format("binaryFile")` at test scale. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("media_id"),
        struct(
          when(col("doc_id") % 3 === 0, "image")
            .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("mediaType"),
          (col("doc_id") % 640 + 64).cast("int").as("width"),
          (col("doc_id") % 480 + 48).cast("int").as("height"),
          (col("n_chars") * 10).as("durationMs")).as("meta"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** ===== STUB ===== deterministic fake decode: real deployments swap
    * this body for the codec call. Derives an 8-dim "embedding" and a
    * checksum from the payload bytes. */
  private def fakeDecode(payload: Array[Byte]): (Long, Array[Float]) = {
    var h = 0L
    val feat = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      h = (h * 31 + (payload(i) & 0xff)) % 1000000007L
      feat(i % 8) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    (h, feat)
  }

  /** Batched per-partition decode/feature-extract: `mapPartitions` so a
    * real codec would init once per partition. Narrow (no shuffle); at
    * 100 TB this scales with input splits. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[DecodedFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // codec init would happen HERE, once per partition
      rows.map { r =>
        val (checksum, feat) = fakeDecode(r.payload)
        DecodedFeatures(r.media_id, r.payload.length.toLong, checksum, feat)
      }
    }
  }

  /** Frame sampling for video rows: one output row per sampled frame
    * offset (every `stepMs`), via a generator column — the frame decode
    * itself is the same stub. */
  def sampleFrames(media: Dataset[MediaRow], stepMs: Long): DataFrame = {
    val df = media.toDF()
    df.filter(col("meta.mediaType") === "video")
      .withColumn("frame_ms",
        explode(expr(s"sequence(0L, meta.durationMs - 1, ${stepMs}L)")))
      .select(col("media_id"), col("frame_ms"),
        xxhash64(col("payload"), col("frame_ms")).as("frame_fingerprint"))
  }

  /** Resize metadata transform (pure metadata op — no pixel work until
    * the stub is replaced): clamps to a bounding box preserving aspect. */
  def resizeMeta(media: Dataset[MediaRow], maxW: Int, maxH: Int): DataFrame =
    media.toDF().select(
      col("media_id"),
      col("meta.width").as("w"), col("meta.height").as("h"))
      .withColumn("scale",
        least(lit(maxW) / col("w"), lit(maxH) / col("h"), lit(1.0)))
      .withColumn("new_w", floor(col("w") * col("scale")).cast("int"))
      .withColumn("new_h", floor(col("h") * col("scale")).cast("int"))
      .select("media_id", "w", "h", "new_w", "new_h")
}
