package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Driver-checkable slices of the multimodal plumbing
  * ([[graft.operators.Multimodal]]): everything except the stubbed codec
  * itself is oracle-checkable — metadata derivation, byte lengths,
  * checksums (same rolling hash as tx4), frame-offset generation and
  * resize arithmetic. */
object MultimodalQueries extends QueryPack {

  /** mm1 — binary column + typed metadata projection. */
  private def mm1(s: SparkSession, d: String): DataFrame =
    Multimodal.mediaTable(s, d).toDF().select(
      col("media_id"), col("meta.mediaType").as("media_type"),
      col("meta.width").as("w"), col("meta.height").as("h"),
      col("meta.durationMs").as("duration_ms"),
      length(col("payload")).cast("long").as("n_bytes"),
      base64(expr("substring(payload, 1, 16)")).as("head_b64"))

  /** mm2 — batched per-partition decode (stubbed codec): byte count +
    * rolling-hash checksum. */
  private def mm2(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeFeatures(Multimodal.mediaTable(s, d))
      .toDF().select("media_id", "n_bytes", "checksum")

  /** mm3 — video frame sampling: one row per 500ms offset. */
  private def mm3(s: SparkSession, d: String): DataFrame =
    Multimodal.sampleFrames(Multimodal.mediaTable(s, d), stepMs = 500L)
      .select("media_id", "frame_ms")

  /** mm4 — resize-to-bounding-box arithmetic (metadata-only until the
    * codec stub is replaced). */
  private def mm4(s: SparkSession, d: String): DataFrame =
    Multimodal.resizeMeta(Multimodal.mediaTable(s, d), maxW = 128, maxH = 96)

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm1_media_metadata" -> (mm1 _),
    "mm2_decode_checksum" -> (mm2 _),
    "mm3_frame_sampling" -> (mm3 _),
    "mm4_resize_meta" -> (mm4 _),
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

  override val oracles: Map[String, String] = Map(
    "mm1_media_metadata" ->
      s"""SELECT media_id, media_type, w, h, duration_ms,
            CAST(length(text) AS BIGINT) AS n_bytes,
            base64(CAST(substr(text, 1, 16) AS BLOB)) AS head_b64
         FROM ($metaSql)""",
    "mm2_decode_checksum" ->
      """SELECT doc_id AS media_id,
            CAST(length(text) AS BIGINT) AS n_bytes,
            list_reduce(
              list_concat([CAST(0 AS BIGINT)],
                [CAST(unicode(substr(text, x, 1)) AS BIGINT)
                 for x in range(1, length(text) + 1)]),
              (acc, x) -> (acc * 31 + x) % 1000000007) AS checksum
         FROM documents""",
    "mm3_frame_sampling" ->
      """SELECT doc_id AS media_id,
            unnest(range(0, n_chars * 10, 500)) AS frame_ms
         FROM documents WHERE doc_id % 3 = 2""",
    "mm4_resize_meta" ->
      s"""SELECT media_id, w, h,
            CAST(floor(w * least(128.0 / w, 96.0 / h, 1.0)) AS INTEGER) AS new_w,
            CAST(floor(h * least(128.0 / w, 96.0 / h, 1.0)) AS INTEGER) AS new_h
         FROM ($metaSql)""",
  )
}
