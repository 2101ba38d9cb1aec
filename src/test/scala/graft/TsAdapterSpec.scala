package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import graft.streaming.EventStreams

/** The driver has shipped `events.ts` as INT64 epoch-nanoseconds (read
  * as LongType under `nanosAsLong`) in early rounds and as
  * `timestamp[us]` since. The three [[EventStreams]] adapters must
  * yield IDENTICAL logical values from either physical schema — this
  * spec materializes the same logical rows under both and drives every
  * adapter (and the sessionization built on the exact-nanos path)
  * through each, so the next schema flip breaks a unit test instead of
  * six driver gates. */
class TsAdapterSpec extends SparkSpec {

  /** The same logical events under both physical schemas. The legacy
    * long carries full nanosecond precision (sub-microsecond digits
    * included — the adapters' truncation contract must match what the
    * old nanosAsLong reading produced). */
  private lazy val (legacy, modern): (DataFrame, DataFrame) = {
    import spark.implicits._
    val rows = Seq(
      // (event_id, user_id, epoch_nanos, value)
      (1L, 7L, 1700000000123456789L, 1.5),
      (2L, 7L, 1700000000123456999L, 2.5), // same microsecond, different nanos
      (3L, 7L, 1700003600000000000L, 3.0), // new session (1h later)
      (4L, 9L, 1700000123000000000L, 4.0),
    )
    val legacyDf = rows.toDF("event_id", "user_id", "ts", "value")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val modernDf = legacyDf.withColumn("ts",
      expr("CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ)"))
    (legacyDf, modernDf)
  }

  test("normalizeTs yields the same TIMESTAMP_NTZ values from either schema") {
    val a = EventStreams.normalizeTs(legacy)
    val b = EventStreams.normalizeTs(modern)
    assert(a.schema("ts").dataType == TimestampNTZType)
    assert(b.schema("ts").dataType == TimestampNTZType)
    assert(a.orderBy("event_id").collect().toSeq ==
      b.orderBy("event_id").collect().toSeq)
  }

  test("tsInstant yields the same TIMESTAMP instants from either schema") {
    val a = EventStreams.tsInstant(legacy)
    val b = EventStreams.tsInstant(modern)
    assert(a.schema("ts").dataType == TimestampType)
    assert(b.schema("ts").dataType == TimestampType)
    assert(a.orderBy("event_id").collect().toSeq ==
      b.orderBy("event_id").collect().toSeq)
  }

  test("tsNanos is exact: pass-through for legacy longs, micros*1000 for timestamps") {
    val a = EventStreams.tsNanos(legacy).orderBy("event_id")
      .select("tns").collect().map(_.getLong(0)).toSeq
    // legacy longs keep their sub-microsecond digits untouched
    assert(a == Seq(1700000000123456789L, 1700000000123456999L,
      1700003600000000000L, 1700000123000000000L))
    val b = EventStreams.tsNanos(modern).orderBy("event_id")
      .select("tns").collect().map(_.getLong(0)).toSeq
    // the modern schema is microsecond physical — nanos are exact *1000
    assert(b == Seq(1700000000123456000L, 1700000000123456000L,
      1700003600000000000L, 1700000123000000000L))
  }

  test("sessionize agrees across schemas and respects the gap") {
    def sess(df: DataFrame) = EventStreams
      .sessionize(df, gapNanos = 1800L * 1000000000L)
      .orderBy("user_id", "session_id")
      .select("user_id", "session_id", "n_events", "duration_ms")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val a = sess(legacy)
    val b = sess(modern)
    // user 7: events 1+2 in one session, event 3 an hour later in a new
    // one; user 9: one singleton session
    assert(a.map(t => (t._1, t._2, t._3)) ==
      Seq((7L, 1L, 2L), (7L, 2L, 1L), (9L, 1L, 1L)), s"got $a")
    // identical except the first session's duration: the legacy nanos
    // differ by 210ns (0ms integer-div), the modern copy by 0us — both
    // round to 0ms, so the results COINCIDE here; the exactness of the
    // two paths is pinned by the tsNanos test above
    assert(a == b, s"legacy=$a modern=$b")
  }

  test("adapters read the driver warehouse (current physical schema) without error") {
    val ev = Tables.t(spark, sf, "events")
    assert(EventStreams.normalizeTs(ev).schema("ts").dataType == TimestampNTZType)
    assert(EventStreams.tsNanos(ev).select("tns").head().get(0).isInstanceOf[Long])
    assert(EventStreams.tsInstant(ev).schema("ts").dataType == TimestampType)
  }

  test("an unsupported ts type fails loudly, not with a wrong plan") {
    val bad = legacy.withColumn("ts", col("ts").cast("string"))
    val e = intercept[IllegalArgumentException](EventStreams.normalizeTs(bad))
    assert(e.getMessage.contains("unsupported events.ts type"))
    assert(legacy.schema("ts").dataType == LongType) // fixture sanity
  }
}
