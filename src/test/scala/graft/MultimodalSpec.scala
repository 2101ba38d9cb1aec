package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("media table carries binary payloads with typed metadata") {
    val m = Multimodal.mediaTable(spark, sf)
    val row = m.filter(col("media_id") === 0L).head()
    assert(row.meta.mediaType == "image")
    assert(new String(row.payload, "UTF-8").nonEmpty)
  }

  test("decode stub is deterministic and batch-shaped per partition") {
    val feats = Multimodal.decodeFeatures(Multimodal.mediaTable(spark, sf))
    val a = feats.collect().map(f => f.media_id -> f.checksum).toMap
    val b = Multimodal.decodeFeatures(Multimodal.mediaTable(spark, sf))
      .collect().map(f => f.media_id -> f.checksum).toMap
    assert(a == b, "stub decode must be deterministic")
    assert(feats.head().feature.length == 8)
  }

  test("frame sampling yields ceil(duration/step) frames per video") {
    val media = Multimodal.mediaTable(spark, sf)
    val frames = Multimodal.sampleFrames(media, 500L)
    val counts = frames.groupBy("media_id").count()
    val expected = media.toDF()
      .filter(col("meta.mediaType") === "video")
      .select(col("media_id"), ceil(col("meta.durationMs") / 500.0).as("n"))
    val joined = counts.join(expected, "media_id")
      .filter(col("count") =!= col("n")).count()
    assert(joined == 0)
  }

  test("resize stays in the bounding box with floor-of-uniform-scale semantics") {
    val r = Multimodal.resizeMeta(Multimodal.mediaTable(spark, sf), 128, 96)
    assert(r.filter(col("new_w") > 128 || col("new_h") > 96).count() == 0)
    // both dims shrink by the SAME scale factor (floored): recompute and compare
    val bad = r
      .withColumn("scale", least(lit(128.0) / col("w"), lit(96.0) / col("h"), lit(1.0)))
      .filter(col("new_w") =!= floor(col("w") * col("scale")).cast("int") ||
        col("new_h") =!= floor(col("h") * col("scale")).cast("int"))
    assert(bad.count() == 0, "resize is not a uniform floored scale")
  }
}
