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

  test("imageTable emits real PNG byte streams") {
    val img = Multimodal.imageTable(spark, sf).head()
    val magic = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    assert(img.payload.take(8).sameElements(magic),
      "payload does not start with the PNG signature")
  }

  test("decode round-trip recovers the generated dimensions and pixels") {
    val decoded = Multimodal.decodeImages(Multimodal.imageTable(spark, sf))
      .collect().map(d => d.media_id -> d).toMap
    decoded.foreach { case (id, d) =>
      val (w, h) = Multimodal.dims(id)
      assert(d.width == w && d.height == h,
        s"image $id decoded ${d.width}x${d.height}, generated ${w}x$h")
    }
    // recompute one checksum from the generation function directly: the
    // decoder must return EXACTLY the written raster (PNG lossless)
    val id = decoded.keys.min
    val (w, h) = Multimodal.dims(id)
    var cs = 0L
    for (y <- 0 until h; x <- 0 until w)
      cs = (cs * 31 + Multimodal.pixel(id, x, y)) % 1000000007L
    assert(decoded(id).checksum == cs, "decoded pixels differ from generated")
    // and it is deterministic across runs
    val again = Multimodal.decodeImages(Multimodal.imageTable(spark, sf))
      .collect().map(d => d.media_id -> d.checksum).toMap
    assert(again == decoded.view.mapValues(_.checksum).toMap)
  }

  test("resize stays in the bounding box with floor-of-uniform-scale semantics") {
    val r = Multimodal.resizeImages(Multimodal.imageTable(spark, sf), 12, 9).toDF()
    assert(r.filter(col("new_w") > 12 || col("new_h") > 9).count() == 0)
    val bad = r
      .withColumn("scale", least(lit(12.0) / col("w"), lit(9.0) / col("h"), lit(1.0)))
      .filter(col("new_w") =!= floor(col("w") * col("scale")).cast("int") ||
        col("new_h") =!= floor(col("h") * col("scale")).cast("int"))
    assert(bad.count() == 0, "resize is not a uniform floored scale")
    // an un-scaled image (scale = 1) resamples to itself: checksums match
    val both = Multimodal.decodeImages(Multimodal.imageTable(spark, sf)).toDF()
      .join(r, "media_id")
      .filter(col("new_w") === col("w") && col("new_h") === col("h"))
      .filter(col("resized_checksum") =!= col("checksum"))
    assert(both.count() == 0, "identity resize changed pixels")
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

  test("WAV decode is a true chunk walk: reordered chunks parse, bad magic rejects") {
    import spark.implicits._
    // encode a clip with the chunk order flipped (data before fmt) and an
    // extra unknown odd-length chunk: a header-offset decoder breaks, a
    // real RIFF walker does not
    val id = 1L
    val n = Multimodal.clipSamples(id)
    val junk = Array[Byte](1, 2, 3) // odd length → word-aligned skip
    val dataBytes = n * 2
    val riffSize = 4 + (8 + junk.length + 1) + (8 + dataBytes) + 24
    val bb = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("junk".getBytes("US-ASCII")).putInt(junk.length).put(junk).put(0.toByte)
    bb.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    (0 until n).foreach(i => bb.putShort(Multimodal.sampleAt(id, i).toShort))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(Multimodal.AudioRate)
      .putInt(Multimodal.AudioRate * 2).putShort(2).putShort(16)
    val reordered = Multimodal.decodeAudio(
      Seq(Multimodal.AudioRow(id, bb.array())).toDS()).head()
    val canonical = Multimodal.decodeAudio(Multimodal.audioTable(spark, sf))
      .filter(_.media_id == id).head()
    assert(reordered == canonical, "chunk order changed the decoded result")
    val bad = bb.array().clone(); bad(0) = 'X'.toByte
    val thrown = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeAudio(Seq(Multimodal.AudioRow(id, bad)).toDS()).head()
    }
    assert(thrown.getMessage != null)
  }

  test("WAV decode: peak, duration, and checksum match the generation function") {
    val decoded = Multimodal.decodeAudio(Multimodal.audioTable(spark, sf)).collect()
    assert(decoded.nonEmpty)
    decoded.foreach { a =>
      val n = Multimodal.clipSamples(a.media_id)
      assert(a.n_samples == n.toLong)
      assert(a.duration_ms == n.toLong * 1000 / Multimodal.AudioRate)
      val samples = (0 until n).map(Multimodal.sampleAt(a.media_id, _))
      assert(a.peak == samples.map(math.abs).max)
      val cs = samples.foldLeft(0L)((acc, s) => (acc * 31 + (s + 32768)) % 1000000007L)
      assert(a.checksum == cs, s"clip ${a.media_id} decoded samples differ")
    }
  }

  test("GIF frame extraction: positioned decode returns exact generated pixels") {
    val sampled = Multimodal.sampleFramesDecoded(
      Multimodal.videoTable(spark, sf), step = 1).collect()
    assert(sampled.nonEmpty)
    val byClip = sampled.groupBy(_.media_id)
    byClip.foreach { case (id, frames) =>
      assert(frames.length == Multimodal.clipFrames(id),
        s"clip $id frame count ${frames.length}")
      frames.foreach { fr =>
        val (w, h) = Multimodal.dims(id)
        assert((fr.width, fr.height) == (w, h))
        var cs = 0L
        for (y <- 0 until h; x <- 0 until w)
          cs = (cs * 31 + Multimodal.framePixel(id, fr.frame_idx.toInt, x, y)) % 1000000007L
        assert(fr.checksum == cs, s"clip $id frame ${fr.frame_idx} pixels differ")
      }
    }
    // step-2 sampling takes every other frame
    val stepped = Multimodal.sampleFramesDecoded(
      Multimodal.videoTable(spark, sf), step = 2).collect()
    val expect = byClip.map { case (id, fs) => id -> fs.map(_.frame_idx).filter(_ % 2 == 0).toSet }
    stepped.groupBy(_.media_id).foreach { case (id, fs) =>
      assert(fs.map(_.frame_idx).toSet == expect(id), s"clip $id sampled wrong frames")
    }
  }
}
