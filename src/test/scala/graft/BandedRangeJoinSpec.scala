package graft

import org.apache.spark.sql.functions._
import graft.operators.BandedRangeJoin

/** Keyless banded range join ([[graft.operators.BandedRangeJoin]]):
  * pair-exact parity with the naive theta join on the real events
  * fixture, band-width invariance (any band ≥ window gives identical
  * pairs), and the narrower-band rejection. */
class BandedRangeJoinSpec extends SparkSpec {

  private val Hour = 3600L * 1000000000L

  private def sides() = {
    val ev = graft.streaming.EventStreams.tsNanos(
      spark.read.parquet(s"$sf/events.parquet"), "tns")
    val probe = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("tns").as("t0"))
    val build = ev.select(col("event_id"), col("tns"))
    (probe, build)
  }

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("signup_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("banded join emits exactly the naive theta join's pairs") {
    val (probe, build) = sides()
    val banded = pairs(BandedRangeJoin.bandJoin(probe, build, "t0", "tns", Hour))
    val naive = pairs(probe.join(build,
      col("tns") >= col("t0") && col("tns") < col("t0") + lit(Hour)))
    assert(naive.nonEmpty, "fixture premise: the hour window matches events")
    assert(banded === naive)
  }

  test("any band width at or above the window is pair-identical") {
    val (probe, build) = sides()
    val base = pairs(BandedRangeJoin.bandJoin(probe, build, "t0", "tns", Hour))
    Seq(Hour, Hour * 2, Hour * 7 + 13L).foreach { band =>
      val got = pairs(BandedRangeJoin.bandJoin(probe, build, "t0", "tns",
        Hour, bandNanos = band))
      assert(got === base, s"band width $band diverged")
    }
  }

  test("grid spatial join emits exactly the naive box join's pairs") {
    val pts = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id").as("pid"),
        expr("CAST(element_at(embedding, 1) AS DOUBLE)").as("px"),
        expr("CAST(element_at(embedding, 2) AS DOUBLE)").as("py"))
    val eps = 0.05
    val banded = graft.operators.GridSpatialJoin
      .selfBoxJoin(pts, "pid", "px", "py", eps)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val q = pts.select(col("pid").as("b"), col("px").as("qx"), col("py").as("qy"))
    val naive = pts.join(q, col("pid") < col("b") &&
      abs(col("px") - col("qx")) < eps && abs(col("py") - col("qy")) < eps)
      .select("pid", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty, "fixture premise: the box matches pairs")
    assert(banded === naive)
  }

  test("a band narrower than the window is rejected, not silently wrong") {
    val (probe, build) = sides()
    intercept[IllegalArgumentException] {
      BandedRangeJoin.bandJoin(probe, build, "t0", "tns", Hour,
        bandNanos = Hour / 2)
    }
  }
}
