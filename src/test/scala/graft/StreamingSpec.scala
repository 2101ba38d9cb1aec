package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.EventStreams

/** Drives the SAME transforms that the batch oracle gate checks through
  * a real Structured Streaming query (readStream → memory sink), and
  * asserts stream/batch parity — the unified-API guarantee the engine
  * relies on. */
class StreamingSpec extends SparkSpec {

  private def runStream(name: String, transform: DataFrame => DataFrame): DataFrame = {
    val sdf = EventStreams.streamed(spark, sf, transform)
    val q = sdf.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // streaming used TIMESTAMP for the watermark; batch used NTZ — same
    // instants under the UTC session, align types for except()
    val out = spark.table(name)
    out.schema.fields.foldLeft(out) { (df, f) =>
      if (f.dataType == org.apache.spark.sql.types.TimestampType)
        df.withColumn(f.name, col(f.name).cast("timestamp_ntz"))
      else df
    }
  }

  test("tumbling window: streaming result equals batch result") {
    val batch = EventStreams.tumblingDaily(EventStreams.normalizeTs(Tables.t(spark, sf, "events")))
    val streamed = runStream("tumbling_mem", EventStreams.tumblingDaily)
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("session window: streaming result equals batch result") {
    val batch = EventStreams.userSessions(EventStreams.normalizeTs(Tables.t(spark, sf, "events")))
    val streamed = runStream("sessions_mem", EventStreams.userSessions)
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("stateful mapGroupsWithState totals equal the batch aggregate") {
    val sdf = EventStreams.runningUserTotals(spark, sf)
    val q = sdf.writeStream
      .outputMode("update")
      .format("memory")
      .queryName("running_mem")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // Update mode emits once per micro-batch the user appears in —
    // keep the FINAL emission per user, keyed by the monotone count
    // (independent max("sum_value") would pick an intermediate batch's
    // sum if any value were negative)
    val latest = spark.table("running_mem")
      .groupBy("user_id")
      .agg(max(struct(col("n_events"), col("sum_value"))).as("m"))
      .select(col("user_id"), col("m.n_events").as("n_events"),
        col("m.sum_value").as("sum_value"))
    val batch = Tables.t(spark, sf, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
    val joined = latest.as("s").join(batch.as("b"), "user_id")
    assert(joined.count() == batch.count())
    val bad = joined.filter(col("s.n_events") =!= col("b.n_events") ||
      abs(col("s.sum_value") - col("b.sum_value")) > 1e-6).count()
    assert(bad == 0, "stateful stream totals diverge from batch")
  }

  test("sliding windows assign each event to exactly two windows") {
    val n = Tables.t(spark, sf, "events").count()
    val windowed = EventStreams.slidingDaily(EventStreams.normalizeTs(Tables.t(spark, sf, "events")))
      .agg(sum("n_events")).head.getLong(0)
    assert(windowed == 2 * n)
  }

  test("streaming incremental dedup drops re-ingested texts across micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft-st5-").toString
    val docs = Tables.t(spark, sf, "documents")
    // a later re-crawl: same texts under fresh ids — lands in later
    // doc_id-range chunks, so the dup arrives in a LATER micro-batch
    // and must be dropped by the anti-join against the committed corpus
    val reingest = docs.withColumn("doc_id", col("doc_id") + 1000000L)
    docs.unionByName(reingest).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val store = new graft.store.TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-st5-store-").toString)
    val kept = graft.streaming.DocStreams.dedupSinkToStore(spark, dir, store, "docs")
    val nDistinct = docs.select("text").distinct().count()
    assert(kept.count() == nDistinct, "exactly one kept row per distinct text")
    assert(kept.filter(col("doc_id") >= 1000000L).count() == 0,
      "the first-arrived (original) copy must win every time")
    assert(store.versionCount("docs") >= 2,
      "multiple micro-batch commits — the dedup really ran incrementally")
  }

  test("fp-keyed streaming dedup: bloom and bloom-off paths keep identical corpora") {
    val dir = java.nio.file.Files.createTempDirectory("graft-st5b-").toString
    val docs = Tables.t(spark, sf, "documents")
    val reingest = docs.withColumn("doc_id", col("doc_id") + 1000000L)
    docs.unionByName(reingest).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    def run(bloomOn: Boolean) = {
      spark.conf.set("spark.graft.dedup.bloomEnabled", bloomOn.toString)
      val store = new graft.store.TableStore(spark,
        java.nio.file.Files.createTempDirectory("graft-st5b-store-").toString)
      graft.streaming.DocStreams.dedupSinkToStoreByFp(spark, dir, store, "docs")
        .select("doc_id", "fp").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    try {
      val withBloom = run(bloomOn = true)
      val without = run(bloomOn = false)
      assert(withBloom == without,
        "bloom pre-split changed which rows were kept")
      assert(withBloom.nonEmpty, "fp dedup kept nothing")
      assert(withBloom.forall(_._1 < 1000000L),
        "the first-arrived (original) copy must win every time")
      val nDistinctFp = Tables.t(spark, sf, "documents")
        .select(graft.operators.TextFns.fingerprint("text")).distinct().count()
      assert(withBloom.size == nDistinctFp, "exactly one kept row per fingerprint")
    } finally spark.conf.unset("spark.graft.dedup.bloomEnabled")
  }

  test("bloom pre-split probe is Catalyst's might_contain: UDF-free plan, exact probe parity") {
    import spark.implicits._
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(1000, 0.01)
    (0L until 500L).map(_ * 7919L).foreach(bloom.putLong)
    val bc = spark.sparkContext.broadcast(bloom)
    // parquet-backed probes: over a LocalRelation the optimizer folds
    // the deterministic predicate away entirely, which would leave no
    // Filter node to audit
    val pdir = java.nio.file.Files.createTempDirectory("graft-bloomprobe-").toString
    (0L until 2000L).map(_ * 13L).toDF("fp").write.mode("overwrite").parquet(pdir)
    val probes = spark.read.parquet(pdir)
    val filtered = probes.filter(
      graft.streaming.DocStreams.mightContainCol(spark, bc, col("fp")))
    // the batch pre-split must stay inside whole-stage codegen: no
    // scala-UDF node anywhere in the plan
    val p = filtered.queryExecution.executedPlan.toString
    assert(!p.contains("UDF") && !p.toLowerCase.contains("batchevalpython"),
      s"bloom pre-split fell off the codegen path:\n$p")
    assert(p.contains("might_contain"), s"expected the native probe:\n$p")
    // exact parity with the driver-side sketch the stream maintains
    val kept = filtered.collect().map(_.getLong(0)).toSet
    val expected = (0L until 2000L).map(_ * 13L)
      .filter(bloom.mightContainLong).toSet
    assert(kept == expected, "expression probe diverged from sketch probe")
  }

  test("fp sink restart resumes against the committed partitioned corpus") {
    // second invocation against the SAME store table: the bloom must
    // seed from the committed corpus (a partitioned multi-dir read),
    // dups from the first run must be dropped, novel rows admitted,
    // and the bucket layout preserved across the restart boundary
    val docs = Tables.t(spark, sf, "documents")
    val store = new graft.store.TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-st5b-restart-").toString)
    val dir1 = java.nio.file.Files.createTempDirectory("graft-st5b-r1-").toString
    docs.limit(120).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir1/documents.parquet")
    val first = graft.streaming.DocStreams
      .dedupSinkToStoreByFp(spark, dir1, store, "docs").count()
    // run 2: the first 120 docs again under fresh ids (all dups) plus
    // genuinely new texts under higher ids
    val dir2 = java.nio.file.Files.createTempDirectory("graft-st5b-r2-").toString
    val redo = docs.limit(120).withColumn("doc_id", col("doc_id") + 1000000L)
    val novel = docs.orderBy(col("doc_id").desc).limit(40)
    redo.unionByName(novel).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir2/documents.parquet")
    // the restart runs under a DIFFERENT session bucket conf: the
    // corpus's creation-pinned modulus must win, or the probe would
    // compute fp mod 3 against dirs labeled fp mod 8, prune away the
    // dir holding the match, and silently re-admit every duplicate
    spark.conf.set("spark.graft.dedup.fpBuckets", "3")
    val after = try graft.streaming.DocStreams
        .dedupSinkToStoreByFp(spark, dir2, store, "docs")
      finally spark.conf.unset("spark.graft.dedup.fpBuckets")
    val expected = docs.limit(120).unionByName(novel)
      .select(graft.operators.TextFns.fingerprint("text")).distinct().count()
    assert(after.count() == expected,
      "restart must drop first-run dups and admit only novel fingerprints")
    assert(after.filter(col("doc_id") >= 1000000L).count() == 0,
      "a re-ingested duplicate must never displace the committed keeper")
    assert(store.partitionColumns("docs") == Seq("fp_bucket"),
      "the partition property must survive the restart")
    assert(store.tableProps("docs") == Map("fpBuckets" -> "8"),
      "the bucket modulus must be pinned at creation and survive commits")
  }

  test("null-text rows are dropped at ingest, not re-admitted every micro-batch") {
    // a null text never matches an equi-join, so without the ingest
    // guard each null row would look "novel" in EVERY batch and
    // accumulate duplicates in the store — the corpus must instead
    // contain zero null rows and exactly one keeper per real text
    val dir = java.nio.file.Files.createTempDirectory("graft-st5null-").toString
    val docs = Tables.t(spark, sf, "documents").limit(200)
    val nulled = docs.withColumn("doc_id", col("doc_id") + 1000000L)
      .withColumn("text", lit(null).cast("string"))
    docs.unionByName(nulled).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val nDistinct = docs.select("text").distinct().count()
    val storeA = new graft.store.TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-st5null-a-").toString)
    val keptText = graft.streaming.DocStreams.dedupSinkToStore(spark, dir, storeA, "docs")
    assert(keptText.filter(col("text").isNull).count() == 0, "null text landed in the corpus")
    assert(keptText.count() == nDistinct, "one keeper per non-null text")
    val storeB = new graft.store.TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-st5null-b-").toString)
    val keptFp = graft.streaming.DocStreams.dedupSinkToStoreByFp(spark, dir, storeB, "docs")
    assert(keptFp.filter(col("fp").isNull).count() == 0, "null fp landed in the corpus")
    assert(keptFp.count() == nDistinct, "one keeper per non-null fingerprint")
  }

  test("stream-stream interval join equals the batch interval join") {
    val sdf = EventStreams.streamStreamSignupJoin(spark, sf)
    val q = sdf.writeStream
      .outputMode("append") // stream-stream inner joins emit append-only
      .format("memory")
      .queryName("ssjoin_mem")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(240000)
    val streamed = spark.table("ssjoin_mem")
      .groupBy("signup_id").agg(count(lit(1)).as("n_events"))
    val ev = EventStreams.normalizeTs(Tables.t(spark, sf, "events"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id").as("s_user"),
        col("ts").as("ts0"))
    val batch = signups.join(ev,
      col("s_user") === ev("user_id") &&
        ev("ts") >= col("ts0") && ev("ts") < col("ts0") + expr("INTERVAL 7 DAYS"))
      .groupBy("signup_id").agg(count(lit(1)).as("n_events"))
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("stream-stream LEFT OUTER join flushes unmatched rows and equals the batch left join") {
    val sdf = EventStreams.streamStreamSignupLeftJoin(spark, sf)
    val q = sdf.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("ssleft_mem")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(240000)
    val streamed = spark.table("ssleft_mem")
      .groupBy("signup_id").agg(count(col("p_id")).as("n_purchases"))
    // the outer join's distinguishing output: signups whose window the
    // WATERMARK proved empty — null-padded rows flushed from state by
    // the trailing heartbeat batch, not append-as-matched
    assert(streamed.filter(col("n_purchases") === 0).take(1).nonEmpty,
      "no unmatched signups were flushed — outer emission did not happen")
    val ev = EventStreams.normalizeTs(Tables.t(spark, sf, "events"))
    val maxTs = ev.agg(max(expr("unix_micros(CAST(ts AS TIMESTAMP))"))).head.getLong(0)
    val signups = ev.filter(col("event_type") === "signup" &&
        expr("unix_micros(CAST(ts AS TIMESTAMP))") <=
          lit(maxTs - (7L * 24 + 2) * 3600L * 1000000L))
      .select(col("event_id").as("signup_id"), col("user_id").as("s_user"),
        col("ts").as("ts0"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_id"))
    val batch = signups.join(p,
      col("s_user") === p("user_id") &&
        col("p_ts") >= col("ts0") && col("p_ts") < col("ts0") + expr("INTERVAL 7 DAYS"),
      "leftOuter")
      .groupBy("signup_id").agg(count(col("p_id")).as("n_purchases"))
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("stream-stream LEFT OUTER across MULTIPLE event-time-ordered batches keeps batch parity") {
    // the one-batch production staging proves losslessness but never
    // advances the watermark between DATA batches; this variant slices
    // the corpus into 4 event-time-ordered micro-batches, so join
    // state built in batch k must survive to match purchases arriving
    // in batch k+1, and rows the advancing watermark proves unmatched
    // must flush — then the whole result still equals the batch join
    val sdf = EventStreams.streamStreamSignupLeftJoinSliced(spark, sf, 4)
    val q = sdf.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("ssleft_mb_mem")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(240000), "stream did not drain within timeout")
    val streamed = spark.table("ssleft_mb_mem")
      .groupBy("signup_id").agg(count(col("p_id")).as("n_purchases"))
    assert(streamed.filter(col("n_purchases") === 0).take(1).nonEmpty,
      "no unmatched signups were flushed across batches")
    val ev = EventStreams.normalizeTs(Tables.t(spark, sf, "events"))
    val maxTs = ev.agg(max(expr("unix_micros(CAST(ts AS TIMESTAMP))"))).head.getLong(0)
    val signups = ev.filter(col("event_type") === "signup" &&
        expr("unix_micros(CAST(ts AS TIMESTAMP))") <=
          lit(maxTs - (7L * 24 + 2) * 3600L * 1000000L))
      .select(col("event_id").as("signup_id"), col("user_id").as("s_user"),
        col("ts").as("ts0"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_id"))
    val batch = signups.join(p,
      col("s_user") === p("user_id") &&
        col("p_ts") >= col("ts0") && col("p_ts") < col("ts0") + expr("INTERVAL 7 DAYS"),
      "leftOuter")
      .groupBy("signup_id").agg(count(col("p_id")).as("n_purchases"))
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("streaming KMV distinct: state rows = groups (one sketch buffer, never the distinct set)") {
    val sdf = EventStreams.streamWindowedKmvDistinct(spark, sf)
    val q = sdf.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stkmv_mem")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(240000)
    // the bounded-state claim, measured at the state store: the
    // aggregation's state rows peak at the number of LIVE (window,
    // event_type) groups — each holding one <=k-hash buffer — not at
    // the number of distinct users flowing through
    val ev = EventStreams.normalizeTs(Tables.t(spark, sf, "events"))
    val groups = ev.select(date_trunc("day", col("ts")), col("event_type"))
      .distinct().count()
    // what a distinct-SET state would hold: one row per live
    // (window, type, user) triple — the thing KMV replaces
    val naiveStateRows = ev.select(date_trunc("day", col("ts")),
      col("event_type"), col("user_id")).distinct().count()
    val peakState = q.recentProgress
      .flatMap(_.stateOperators.map(_.numRowsTotal)).max
    assert(peakState <= groups,
      s"state rows $peakState exceed the $groups (window, type) groups")
    assert(naiveStateRows > groups,
      "fixture must make the distinct-set state strictly larger for the claim to bite")
    // and the drained result covers every window exactly once
    val streamed = spark.table("stkmv_mem")
    assert(streamed.count() == groups)
    val exact = ev.groupBy(date_trunc("day", col("ts")).as("w"), col("event_type"))
      .agg(countDistinct("user_id").as("n"))
    // below k the sketch is exact: capped count == true distinct count
    val joined = streamed.join(exact,
      streamed("win_start") === col("w") &&
        streamed("event_type") === exact("event_type"))
    assert(joined.filter(col("n") < 256 &&
      col("n_distinct_capped") =!= col("n")).isEmpty,
      "below-k windows must report the exact distinct count")
  }

  test("streaming tuple sketch: state rows = groups; below-k windows exact on the dedup sum") {
    val sdf = EventStreams.streamWindowedTupleSum(spark, sf)
    val q = sdf.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("sttuple_mem")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(240000)
    val ev = EventStreams.normalizeTs(Tables.t(spark, sf, "events"))
    val groups = ev.select(date_trunc("day", col("ts")), col("event_type"))
      .distinct().count()
    val peakState = q.recentProgress
      .flatMap(_.stateOperators.map(_.numRowsTotal)).max
    assert(peakState <= groups,
      s"state rows $peakState exceed the $groups (window, type) groups")
    val streamed = spark.table("sttuple_mem")
    assert(streamed.count() == groups)
    // below k the tuple sketch is exact: the emitted micros equal the
    // true sum-over-distinct-users-of-max-cents
    val exact = ev
      .groupBy(date_trunc("day", col("ts")).as("w"), col("event_type"),
        col("user_id"))
      .agg(max(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).as("mc"))
      .groupBy(col("w"), col("event_type"))
      .agg(sum("mc").as("s"), count(lit(1)).as("nd"))
    val joined = streamed.join(exact,
      streamed("win_start") === col("w") &&
        streamed("event_type") === exact("event_type"))
    assert(joined.filter(col("nd") < 256 &&
      col("est_sum_max_micro") =!= col("s") * 1000000L).isEmpty,
      "below-k windows must report the exact deduplicated sum")
  }

  test("incremental sessionize: per-batch maintenance, bounded state, batch parity") {
    val store = new graft.store.TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-sess-inc-").toString)
    val out = EventStreams.sessionizeSinkToStore(spark, sf, store, "sessions",
      gapSeconds = 1800L, vars = Seq("user_id", "ts", "value", "event_id"))
    // parity: the incrementally maintained table equals the one-shot
    // batch sessionization, row for row
    val batch = EventStreams.sessionize(
      Tables.t(spark, sf, "events"), gapNanos = 1800L * 1000000000L)
    assert(out.count() == batch.count())
    assert(out.except(batch).isEmpty && batch.except(out).isEmpty,
      "incremental sessions diverge from the batch islands analysis")
    // the closed log really accreted across micro-batches (append-only
    // commits), and sessions were NOT produced by one final recompute
    assert(store.versionCount("sessions__closed") >= 2,
      "closed-session log must accrete per micro-batch")
    // state is bounded by one OPEN session per active user
    val stateRows = store.read("sessions__state").count()
    val users = Tables.t(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(stateRows <= users, s"state $stateRows exceeds active users $users")
    // every user's open session is their LAST one: max ordinal per user
    val lastByState = store.read("sessions__state")
      .select(col("user_id"), col("session_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lastByBatch = batch.groupBy("user_id")
      .agg(max("session_id").as("m")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lastByState == lastByBatch, "open-session ordinals drifted")
  }

  test("incremental sessionize: a replayed micro-batch is exactly-once") {
    val store = new graft.store.TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-sess-replay-").toString)
    val ev = Tables.t(spark, sf, "events").limit(500)
    val gap = 1800L * 1000000000L
    // drive the merge directly: batch 0, then REPLAY batch 0 (a restart
    // re-delivers it), then batch 1
    val b0 = EventStreams.sessionizeExact(
      ev.filter(col("event_id") % 2 === 0), gap)
    val b1 = EventStreams.sessionizeExact(
      ev.filter(col("event_id") % 2 === 1), gap)
    def snapshot(): (Long, Long, Long) = (
      if (store.exists("s__closed")) store.read("s__closed").count() else 0L,
      store.read("s__state").count(),
      store.read("s__mark").head().getLong(0))
    EventStreams.mergeSessionBatch(store, "s", gap, b0, batchId = 0L)
    val afterFirst = snapshot()
    EventStreams.mergeSessionBatch(store, "s", gap, b0, batchId = 0L) // replay
    assert(snapshot() == afterFirst,
      "replaying a committed micro-batch must change nothing")
    EventStreams.mergeSessionBatch(store, "s", gap, b1, batchId = 1L)
    assert(snapshot()._3 == 1L, "mark must advance with the next batch")
    // the mark write is part of the SAME commit as the data: two
    // applied batches (and one replay no-op) = exactly two published
    // store transactions
    assert(store.commitCount() == 2,
      "each batch must be one atomic multi-table commit")
  }

  test("incremental sessionize: a second run extends the carried state, not replays it") {
    import org.apache.spark.sql.DataFrame
    // two source dirs split by event time; running the sink twice
    // against the SAME store table must equal one batch sessionization
    // over the union — the carried open-session state bridges runs and
    // the reset replay mark must not drop the second run's batches
    val ev = Tables.t(spark, sf, "events")
      .select("user_id", "ts", "value", "event_id")
    val cut = ev.selectExpr("percentile(CAST(unix_micros(CAST(ts AS TIMESTAMP)) AS DOUBLE), 0.5)")
      .head().getDouble(0)
    def stage(df: DataFrame): String = {
      val d = java.nio.file.Files.createTempDirectory("graft-sess-run-").toString
      df.coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
      d
    }
    val isLate = expr(s"CAST(unix_micros(CAST(ts AS TIMESTAMP)) AS DOUBLE) > $cut")
    val d1 = stage(ev.filter(!isLate))
    val d2 = stage(ev.filter(isLate))
    val store = new graft.store.TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-sess-tworuns-").toString)
    EventStreams.sessionizeSinkToStore(spark, d1, store, "sessions",
      gapSeconds = 1800L, vars = Seq("user_id", "ts", "value", "event_id"))
    val out = EventStreams.sessionizeSinkToStore(spark, d2, store, "sessions",
      gapSeconds = 1800L, vars = Seq("user_id", "ts", "value", "event_id"))
    val batch = EventStreams.sessionize(ev, gapNanos = 1800L * 1000000000L)
    assert(out.count() == batch.count(),
      s"two-run session count ${out.count()} != one-shot ${batch.count()}")
    assert(out.except(batch).isEmpty && batch.except(out).isEmpty,
      "two-run sessions diverge from the one-shot batch analysis")
  }

  test("incremental sessionize: an empty source publishes an empty session table") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sess-empty-").toString
    Tables.t(spark, sf, "events").limit(0).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val store = new graft.store.TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-sess-empty-store-").toString)
    val out = EventStreams.sessionizeSinkToStore(spark, dir, store, "sessions",
      gapSeconds = 1800L, vars = Seq("user_id", "ts", "value", "event_id"))
    assert(out.count() == 0, "empty source must yield an empty session table")
    assert(out.columns.toSeq == Seq("user_id", "session_id", "n_events",
      "start_us", "end_us", "duration_ms", "sum_value"))
  }
}
