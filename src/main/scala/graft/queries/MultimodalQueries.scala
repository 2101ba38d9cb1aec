package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Driver-checkable slices of the multimodal operators
  * ([[graft.operators.Multimodal]]). mm2/mm4 run a REAL codec round
  * trip — PNG bytes encoded and decoded by `javax.imageio`, checksums
  * over the decoded raster — and stay oracle-exact because the
  * generation function is deterministic and PNG is lossless: DuckDB
  * recomputes each pixel from (doc_id, x, y) and folds the same
  * checksum, so a decoder that returned wrong dimensions or wrong
  * pixels would hash-mismatch. */
object MultimodalQueries extends QueryPack {

  /** mm1 — binary column + typed metadata projection. */
  private def mm1(s: SparkSession, d: String): DataFrame =
    Multimodal.mediaTable(s, d).toDF().select(
      col("media_id"), col("meta.mediaType").as("media_type"),
      col("meta.width").as("w"), col("meta.height").as("h"),
      col("meta.durationMs").as("duration_ms"),
      length(col("payload")).cast("long").as("n_bytes"),
      base64(expr("substring(payload, 1, 16)")).as("head_b64"))

  /** mm2 — real PNG decode: encode → decode → checksum every decoded
    * pixel. Width/height come from the DECODER, not carried metadata. */
  private def mm2(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeImages(Multimodal.imageTable(s, d)).toDF()

  /** mm3 — video frame sampling: one row per 500ms offset. */
  private def mm3(s: SparkSession, d: String): DataFrame =
    Multimodal.sampleFrames(Multimodal.mediaTable(s, d), stepMs = 500L)
      .select("media_id", "frame_ms")

  /** mm4 — real decode + nearest-neighbor resample into a 12×9 box,
    * checksum over the RESIZED pixels. */
  private def mm4(s: SparkSession, d: String): DataFrame =
    Multimodal.resizeImages(Multimodal.imageTable(s, d), maxW = 12, maxH = 9).toDF()

  /** mm5 — real WAV decode: hand-encoded RIFF/PCM clips parsed back by
    * walking the chunk sequence; peak + checksum over the decoded int16
    * samples. PCM is lossless, so the oracle recomputes every sample. */
  private def mm5(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeAudio(Multimodal.audioTable(s, d)).toDF()

  /** mm6 — real video frame extraction: every 2nd frame of each
    * multi-frame GIF positioned-decoded, checksum over the decoded
    * frame's pixels. */
  private def mm6(s: SparkSession, d: String): DataFrame =
    Multimodal.sampleFramesDecoded(Multimodal.videoTable(s, d), step = 2).toDF()

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm1_media_metadata" -> (mm1 _),
    "mm2_decode_checksum" -> (mm2 _),
    "mm3_frame_sampling" -> (mm3 _),
    "mm4_resize_meta" -> (mm4 _),
    "mm5_audio_decode" -> (mm5 _),
    "mm6_video_frames" -> (mm6 _),
  )

  private val metaSql =
    """SELECT doc_id AS media_id,
              CASE WHEN doc_id % 3 = 0 THEN 'image'
                   WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
              CAST(doc_id % 640 + 64 AS INTEGER) AS w,
              CAST(doc_id % 480 + 48 AS INTEGER) AS h,
              n_chars * 10 AS duration_ms,
              text
       FROM documents"""

  /** The image dimensions mirror [[Multimodal.dims]]. */
  private val dimsSql =
    """SELECT doc_id,
              CAST(doc_id % 16 + 8 AS INTEGER) AS w,
              CAST(doc_id % 12 + 6 AS INTEGER) AS h
       FROM documents"""

  /** `(acc*31 + pixel) % p` folded over `n` pixels, where the pixel at
    * flat index x is computed by `grayExpr` (mirrors
    * [[Multimodal.pixel]] through whatever source-index arithmetic the
    * caller needs). */
  private def checksumSql(n: String, grayExpr: String): String =
    s"""list_reduce(
          list_concat([CAST(0 AS BIGINT)],
            [CAST($grayExpr AS BIGINT) for x in range(0, $n)]),
          (acc, v) -> (acc * 31 + v) % 1000000007)"""

  override val oracles: Map[String, String] = Map(
    "mm1_media_metadata" ->
      s"""SELECT media_id, media_type, w, h, duration_ms,
            CAST(length(text) AS BIGINT) AS n_bytes,
            base64(CAST(substr(text, 1, 16) AS BLOB)) AS head_b64
         FROM ($metaSql)""",
    // the decoded raster equals the generation function (PNG lossless):
    // pixel(id, x, y) = (id*7 + x*31 + y*13) % 256, row-major fold
    "mm2_decode_checksum" ->
      s"""SELECT doc_id AS media_id, w AS width, h AS height,
            CAST(w AS BIGINT) * h AS n_px,
            ${checksumSql("w * h",
              "(doc_id * 7 + (x % w) * 31 + (x // w) * 13) % 256")} AS checksum
         FROM ($dimsSql)""",
    "mm3_frame_sampling" ->
      """SELECT doc_id AS media_id,
            unnest(range(0, n_chars * 10, 500)) AS frame_ms
         FROM documents WHERE doc_id % 3 = 2""",
    // the decoded samples equal the generation function (PCM lossless):
    // sample(id, i) = ((id*31 + i*17) % 65536) - 32768, fold over i with
    // the sample shifted to unsigned
    "mm5_audio_decode" ->
      s"""WITH a AS (
            SELECT doc_id AS media_id, CAST(doc_id % 500 + 100 AS BIGINT) AS n
            FROM documents WHERE doc_id % 3 = 1)
          SELECT media_id, 8000 AS sample_rate, n AS n_samples,
            n * 1000 // 8000 AS duration_ms,
            CAST(list_max(
              [abs((media_id * 31 + x * 17) % 65536 - 32768)
               for x in range(0, n)]) AS INTEGER) AS peak,
            ${checksumSql("n", "(media_id * 31 + x * 17) % 65536")} AS checksum
          FROM a""",
    // frame pixels equal the generation function (GIF lossless for an
    // 8-bit grayscale palette): framePixel(id, f, x, y) =
    // ((id + 997*f)*7 + x*31 + y*13) % 256, frames sampled by 2
    "mm6_video_frames" ->
      s"""WITH v AS (
            SELECT doc_id, w, h, unnest(range(0, doc_id % 4 + 2, 2)) AS f
            FROM ($dimsSql) WHERE doc_id % 3 = 2)
          SELECT doc_id AS media_id, f AS frame_idx, w AS width, h AS height,
            ${checksumSql("w * h",
              "((doc_id + 997 * f) * 7 + (x % w) * 31 + (x // w) * 13) % 256")} AS checksum
          FROM v""",
    // nearest-neighbor source index: sx = (x % new_w) * w // new_w,
    // sy = (x // new_w) * h // new_h — integer math, same as the JVM
    "mm4_resize_meta" ->
      s"""WITH nd AS (
            SELECT doc_id, w, h,
              CAST(floor(w * least(12.0 / w, 9.0 / h, 1.0)) AS INTEGER) AS new_w,
              CAST(floor(h * least(12.0 / w, 9.0 / h, 1.0)) AS INTEGER) AS new_h
            FROM ($dimsSql))
          SELECT doc_id AS media_id, w, h, new_w, new_h,
            ${checksumSql("new_w * new_h",
              """(doc_id * 7 + (((x % new_w) * w) // new_w) * 31
                 + (((x // new_w) * h) // new_h) * 13) % 256""")} AS resized_checksum
          FROM nd""",
  )
}
