package graft

import org.apache.spark.sql.functions._

import graft.operators.{BandedRangeJoin, RangeCount}

/** Segment-tree range count ([[RangeCount]]): exact parity with the
  * pair-enumerating band join on the same intervals — including
  * misaligned boundaries, probes outside the data span, sub-leaf
  * windows, and single-leaf intervals — plus the inner-join (no
  * zero-count rows) contract. */
class RangeCountSpec extends SparkSpec {

  private def counts(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("matches the band-join counts on the events fixture, hour window") {
    val ev = graft.streaming.EventStreams.tsNanos(
      Tables.t(spark, sf, "events"), "tns")
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("tns").as("t0"))
    val all = ev.select(col("tns"))
    val w = 3600L * 1000000000L
    val viaTree = counts(RangeCount.rangeCount(
      signups, all, "signup_id", "t0", "tns", w))
    val viaPairs = counts(BandedRangeJoin.bandJoin(signups, all, "t0", "tns", w)
      .groupBy("signup_id").agg(count(lit(1)).as("n")))
    assert(viaTree.nonEmpty && viaTree == viaPairs)
  }

  test("adversarial windows: misaligned, sub-leaf, out-of-span, single-leaf") {
    import spark.implicits._
    // deterministic irregular points over ~1000 units
    val pts = (0 until 400).map(i => (i.toLong * i % 997) * 13L + 7L)
    val build = pts.toDF("tns")
    // probes: windows of several sizes incl. 1 (single point), huge
    // (covers everything), and starts beyond both ends of the data
    val starts = Seq(-500L, 0L, 3L, 997L, 4096L, 9000L, 12961L, 13000L, 99999L)
    for (w <- Seq(1L, 7L, 64L, 1000L, 100000L)) {
      val probe = starts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("pid", "t0")
      val got = counts(RangeCount.rangeCount(
        probe, build, "pid", "t0", "tns", w, targetLeafRows = 4))
      val want = starts.zipWithIndex.flatMap { case (t, i) =>
        val n = pts.count(p => p >= t && p < t + w).toLong
        if (n > 0) Some(i.toLong -> n) else None
      }.toMap
      assert(got == want, s"window $w: got $got want $want")
    }
  }

  test("range SUM rides the same tree: band-join parity, NULL values count but add 0") {
    import spark.implicits._
    val build = Seq((10L, Some(5L)), (20L, None), (30L, Some(7L)),
      (95L, Some(11L)), (170L, Some(13L))).toDF("tns", "v")
    val probe = Seq((1L, 0L), (2L, 15L), (3L, 90L), (4L, 500L)).toDF("pid", "t0")
    val got = RangeCount.rangeAgg(probe, build, "pid", "t0", "tns",
        Some("v"), windowNanos = 100L, targetLeafRows = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // window 100: pid1 covers {10,20,30,95} sum 5+0+7+11; pid2 covers
    // {20,30,95} sum 18; pid3 covers {95,170} sum 24; pid4 nothing
    assert(got == Map(1L -> (4L, 23L), 2L -> (3L, 18L), 3L -> (2L, 24L)))
    // fixture-scale parity against the pair-enumerating form
    val ev = graft.streaming.EventStreams.tsNanos(
      Tables.t(spark, sf, "events"), "tns")
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("tns").as("t0"))
    val all = ev.select(col("tns"),
      expr("CAST(floor(value * 1000000) AS BIGINT)").as("vm"))
    val w = 3600L * 1000000000L
    val viaTree = RangeCount.rangeAgg(signups, all, "signup_id",
        "t0", "tns", Some("vm"), w)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val viaPairs = BandedRangeJoin.bandJoin(signups, all, "t0", "tns", w)
      .groupBy("signup_id")
      .agg(count(lit(1)).as("n"), sum("vm").as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(viaTree.nonEmpty && viaTree == viaPairs)
  }

  test("range MIN/MAX ride the same tree: NULL-skip semantics, band-join parity") {
    import spark.implicits._
    val build = Seq((10L, Some(5L)), (20L, None), (30L, Some(7L)),
      (95L, Some(11L)), (170L, Some(13L)), (250L, None)).toDF("tns", "v")
    val probe = Seq((1L, 0L), (2L, 15L), (3L, 90L), (4L, 500L),
      (5L, 210L)).toDF("pid", "t0")
    val got = RangeCount.rangeAggAll(probe, build, "pid", "t0", "tns",
        Some("v"), windowNanos = 100L, targetLeafRows = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    // pid1 {10,20,30,95}: min 5 max 11 (the NULL at 20 is invisible);
    // pid2 {20,30,95}: min 7 max 11; pid3 {95,170}: min 11 max 13;
    // pid5 {250}: the only row is NULL-valued — counts, sums 0, and
    // min/max are NULL (plain SQL semantics)
    assert(got == Map(
      1L -> ((4L, 23L, Some(5L), Some(11L))),
      2L -> ((3L, 18L, Some(7L), Some(11L))),
      3L -> ((2L, 24L, Some(11L), Some(13L))),
      5L -> ((1L, 0L, None, None))))
    // fixture-scale parity against the pair-enumerating form
    val ev = graft.streaming.EventStreams.tsNanos(
      Tables.t(spark, sf, "events"), "tns")
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("tns").as("t0"))
    val all = ev.select(col("tns"),
      expr("CAST(floor(value * 1000000) AS BIGINT)").as("vm"))
    val w = 3600L * 1000000000L
    val viaTree = RangeCount.rangeAggAll(signups, all, "signup_id",
        "t0", "tns", Some("vm"), w)
    val viaPairs = BandedRangeJoin.bandJoin(signups, all, "t0", "tns", w)
      .groupBy("signup_id")
      .agg(count(lit(1)).as("n_events"), sum("vm").as("sum_value"),
        min("vm").as("min_value"), max("vm").as("max_value"))
    assert(viaTree.count() > 0)
    assert(viaTree.exceptAll(viaPairs).isEmpty &&
      viaPairs.exceptAll(viaTree).isEmpty)
  }

  test("no zero-count rows; empty build yields empty result") {
    import spark.implicits._
    val build = Seq(100L, 200L).toDF("tns")
    val probe = Seq((1L, 150L), (2L, 300L)).toDF("pid", "t0")
    val got = counts(RangeCount.rangeCount(probe, build, "pid", "t0", "tns", 60L))
    assert(got == Map(1L -> 1L)) // probe 2 matches nothing -> absent
    val none = RangeCount.rangeCount(probe,
      build.filter(col("tns") > 1000L), "pid", "t0", "tns", 60L)
    assert(none.count() == 0)
  }
}
