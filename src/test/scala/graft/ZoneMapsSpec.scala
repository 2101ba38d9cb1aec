package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.store.{TableStore, ZoneMaps}

/** Manifest-level zone maps: pruning effect (a range probe opens only
  * the overlapping commits), parity with the unpruned filter across
  * every store mutation, and the conservative fallbacks (untracked
  * dirs kept, schema ops disable pruning). */
class ZoneMapsSpec extends SparkSpec {

  private def freshStore(): TableStore =
    new TableStore(spark, Files.createTempDirectory("graft-zm-").toString)

  /** Ordered ingest: k-sliced inserts so each commit's dir covers one
    * narrow id band — the time-series shape the layer exists for. */
  private def seed(st: TableStore, bands: Int = 6, perBand: Int = 100): Unit = {
    def band(i: Int): DataFrame = spark.range(i * perBand, (i + 1) * perBand)
      .select(col("id").as("k"), (col("id") % 7).as("v"))
    ZoneMaps.createTracked(st, "t", band(0), Seq("k"))
    (1 until bands).foreach(i => st.insert("t", band(i)))
  }

  test("a band probe keeps exactly the overlapping commits and answers exactly") {
    val st = freshStore()
    seed(st)
    assert(st.read("t").count() == 600)
    // probe inside band 2 plus the first row of band 3
    val kept = ZoneMaps.keptDirs(st, "t", "k", 250, 300)
    assert(kept.size == 2, s"expected 2 of 6 dirs kept, got ${kept.size}")
    val pruned = ZoneMaps.readRange(st, "t", "k", 250, 300)
    val full = st.read("t").filter(col("k").between(250, 300))
    assert(pruned.count() == 51)
    assert(pruned.except(full).isEmpty && full.except(pruned).isEmpty)
    // an empty-intersection probe keeps nothing and answers empty
    assert(ZoneMaps.keptDirs(st, "t", "k", 10000, 20000).isEmpty)
    assert(ZoneMaps.readRange(st, "t", "k", 10000, 20000).count() == 0)
  }

  test("a copy-on-write rewrite loses its stats conservatively, answers stay exact") {
    val st = freshStore()
    seed(st)
    // the update rewrites only the dirs holding matched rows (file-level
    // COW); those NEW dirs carry no stats and must be kept by any probe
    st.update("t", Map("v" -> lit(99L)), col("k") === 150L)
    val keptAfter = ZoneMaps.keptDirs(st, "t", "k", 250, 300)
    assert(keptAfter.size >= 2, "rewritten dirs must be kept conservatively")
    val pruned = ZoneMaps.readRange(st, "t", "k", 100, 199)
    val full = st.read("t").filter(col("k").between(100, 199))
    assert(pruned.except(full).isEmpty && full.except(pruned).isEmpty)
    assert(pruned.filter(col("k") === 150L).head.getLong(1) == 99L)
    // re-track: one stamp restores pruning for the rewritten dirs
    ZoneMaps.retrack(st, "t")
    assert(ZoneMaps.keptDirs(st, "t", "k", 250, 300).size == 2,
      "re-tracked table must prune like the original")
  }

  test("pending schema ops disable pruning, the fallback read stays exact") {
    val st = freshStore()
    seed(st)
    st.addColumn("t", "v2", "BIGINT", Some("v * 2"))
    val got = ZoneMaps.readRange(st, "t", "k", 250, 300)
    val full = st.read("t").filter(col("k").between(250, 300))
    assert(got.columns.contains("v2"), "fallback must read the evolved schema")
    assert(got.except(full).isEmpty && full.except(got).isEmpty)
  }

  test("an all-null tracked dir stamps a sentinel once and prunes from every probe") {
    val st = freshStore()
    seed(st, bands = 2)
    // a commit whose tracked column is entirely NULL
    st.insert("t", spark.range(0, 10)
      .select(lit(null).cast("long").as("k"), col("id").as("v")))
    val sentinels = st.tableProps("t").filter { case (key, v) =>
      key.startsWith("zm.") && v == "-" }
    assert(sentinels.size === 1,
      s"the all-null dir must stamp an explicit no-stats sentinel: " +
        s"${st.tableProps("t").filter(_._1.startsWith("zm."))}")
    // NULL fails every range predicate, so the sentinel dir PRUNES
    assert(ZoneMaps.keptDirs(st, "t", "k", 0, 1000000).size === 2)
    val pruned = ZoneMaps.readRange(st, "t", "k", 0, 250)
    val full = st.read("t").filter(col("k").between(0, 250))
    assert(pruned.except(full).isEmpty && full.except(pruned).isEmpty)
    // the stamp is permanent: later inserts must not re-aggregate the
    // all-null dir (its key now exists), only stamp their own dir
    st.insert("t", spark.range(200, 210)
      .select(col("id").as("k"), (col("id") % 7).as("v")))
    val zm = st.tableProps("t").keys.count(_.startsWith("zm."))
    assert(zm === st.dataDirs("t").size, "exactly one stamp per current dir")
  }

  test("zm stamps for dirs a rewrite replaced prune from the prop map") {
    val st = freshStore()
    seed(st)
    val before = st.tableProps("t").keys.count(_.startsWith("zm."))
    assert(before === 6)
    // the COW update replaces one dir; its old stamp is now stale and
    // the next stamp pass must drop it (the prop map must not grow
    // with mutation history — fastCount's rows.* hygiene)
    st.update("t", Map("v" -> lit(99L)), col("k") === 150L)
    ZoneMaps.retrack(st, "t")
    val dirs = st.dataDirs("t").toSet
    val zmKeys = st.tableProps("t").keys.filter(_.startsWith("zm.")).toSeq
    assert(zmKeys.size === dirs.size,
      s"one live stamp per current dir, no stale keys: $zmKeys")
    assert(zmKeys.forall(k => dirs.exists(d => k == s"zm.$d.k")),
      s"every stamp must name a current dir: $zmKeys vs $dirs")
  }

  test("untracked tables are unaffected; stats survive unrelated inserts") {
    val st = freshStore()
    st.create("u", spark.range(0, 10).select(col("id").as("k")))
    st.insert("u", spark.range(10, 20).select(col("id").as("k")))
    assert(st.read("u").count() == 20) // no stamp path engaged, no props
    assert(st.tableProps("u").isEmpty)
    seed(st, bands = 2)
    val statKeys = st.tableProps("t").keys.filter(_.startsWith("zm."))
    assert(statKeys.size == 2, s"one stat per dir per col: $statKeys")
  }

  /** Name-ordered string ingest: 6 commits, each covering one narrow
    * lexicographic band of zero-padded keys. */
  private def seedString(st: TableStore, bands: Int = 6,
      perBand: Int = 100): Unit = {
    def band(i: Int): DataFrame =
      spark.range(i * perBand, (i + 1) * perBand)
        .select(concat(lit("key-"), lpad(col("id").cast("string"), 6, "0"))
          .as("name"), col("id").as("v"))
    ZoneMaps.createTracked(st, "s", band(0), Seq("name"))
    (1 until bands).foreach(i => st.insert("s", band(i)))
  }

  test("string zone maps: range and prefix probes keep only the overlapping commits, answers exact") {
    val st = freshStore()
    seedString(st)
    // range inside band 2 plus the first key of band 3
    val kept = ZoneMaps.keptDirsString(st, "s", "name",
      Some("key-000250"), Some("key-000300"))
    assert(kept.size == 2, s"expected 2 of 6 dirs kept, got ${kept.size}")
    val pruned = ZoneMaps.readRangeString(st, "s", "name",
      "key-000250", "key-000300")
    val full = st.read("s")
      .filter(col("name") >= "key-000250" && col("name") <= "key-000300")
    assert(pruned.count() == 51)
    assert(pruned.except(full).isEmpty && full.except(pruned).isEmpty)
    // prefix probe: key-0001* is exactly band 1
    val pre = ZoneMaps.readPrefix(st, "s", "name", "key-0001")
    assert(pre.count() == 100)
    assert(pre.except(st.read("s").filter(col("name").startsWith("key-0001")))
      .isEmpty)
    // a disjoint range keeps nothing and answers empty
    assert(ZoneMaps.keptDirsString(st, "s", "name",
      Some("zzz"), Some("zzzz")).isEmpty)
    assert(ZoneMaps.readRangeString(st, "s", "name", "zzz", "zzzz").count() == 0)
  }

  test("string zone maps: all-null dirs prune via the sentinel; numeric stamps keep conservatively") {
    val st = freshStore()
    seedString(st, bands = 2)
    import spark.implicits._
    st.insert("s", Seq((null.asInstanceOf[String], 999L)).toDF("name", "v"))
    // the all-null dir carries the sentinel and prunes from string probes
    val kept = ZoneMaps.keptDirsString(st, "s", "name",
      Some("key-000000"), Some("key-999999"))
    assert(kept.size == 2, s"null dir must prune: $kept")
    // a NUMERIC probe consulting the string stamp keeps conservatively
    // (parseStat can't read s64: stamps) — answers stay exact
    val numKept = ZoneMaps.keptDirs(st, "s", "v", 0, 10)
    assert(numKept.size == 3, s"string stamp must keep under numeric probe: $numKept")
  }

  /** Time-ordered ingest with a NATIVE TimestampType column: band i
    * covers minutes [i·100, (i+1)·100) after a fixed epoch base. */
  private def seedTs(st: TableStore, bands: Int = 6, perBand: Int = 100): Unit = {
    val base = 1700000000000000L // fixed epoch micros
    def band(i: Int): DataFrame = spark.range(i * perBand, (i + 1) * perBand)
      .select(expr(s"timestamp_micros(${base}L + id * 60000000)").as("ets"),
        col("id").as("v"))
    ZoneMaps.createTracked(st, "ts", band(0), Seq("ets"))
    (1 until bands).foreach(i => st.insert("ts", band(i)))
  }

  test("timestamp zone maps: micros probes keep only overlapping commits; transparent TIMESTAMP filter prunes") {
    val st = freshStore()
    seedTs(st)
    val base = 1700000000000000L
    def mic(i: Long) = base + i * 60000000L
    // probe inside band 2 plus the first row of band 3
    val kept = ZoneMaps.keptDirsTagged(st, "ts", "ets", "t64:",
      mic(250), mic(300))
    assert(kept.size == 2, s"expected 2 of 6 dirs kept, got ${kept.size}")
    val pruned = ZoneMaps.readRangeMicros(st, "ts", "ets", mic(250), mic(300))
    val full = st.read("ts")
      .filter(unix_micros(col("ets")).between(mic(250), mic(300)))
    assert(pruned.count() == 51)
    assert(pruned.except(full).isEmpty && full.except(pruned).isEmpty)
    // disjoint probe: nothing kept, answer empty
    assert(ZoneMaps.keptDirsTagged(st, "ts", "ets", "t64:",
      mic(10000), mic(20000)).isEmpty)
    // a plain INTEGRAL probe consulting the t64 stamp keeps
    // conservatively (different space — disjointness means nothing)
    assert(ZoneMaps.keptDirs(st, "ts", "ets", 0, 1).size == 6)
    // transparent: a plain ets >= TIMESTAMP-literal filter routes
    // through AutoSkip's t64 extraction, no epoch cast anywhere
    val rule = graft.plans.AutoSkip.install(spark, st)
    try {
      def roots(df: DataFrame): Seq[Int] =
        df.queryExecution.optimizedPlan.collect {
          case org.apache.spark.sql.execution.datasources.LogicalRelation(
            h: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
            _, _, _, _) => h.location.rootPaths.size
        }
      val rng = st.read("ts").filter(
        col("ets") >= expr(s"timestamp_micros(${mic(250)}L)") &&
          col("ets") <= expr(s"timestamp_micros(${mic(300)}L)"))
      assert(roots(rng) == Seq(2), s"timestamp range did not prune: ${roots(rng)}")
      assert(rng.count() == 51)
    } finally graft.plans.AutoSkip.uninstall(spark, rule)
  }

  /** Value-ordered ingest over a SIGN-SPANNING double range: band i
    * covers [i·100 − 300, (i+1)·100 − 300) — negative encodings and
    * the sign crossing are on the probed path, not just positives. */
  private def seedDbl(st: TableStore, bands: Int = 6, perBand: Int = 100): Unit = {
    def band(i: Int): DataFrame = spark.range(i * perBand, (i + 1) * perBand)
      .select((col("id").cast("double") - 300.0).as("dv"), col("id").as("v"))
    ZoneMaps.createTracked(st, "dbl", band(0), Seq("dv"))
    (1 until bands).foreach(i => st.insert("dbl", band(i)))
  }

  test("double zone maps: total-order-bits probes keep only overlapping commits across the sign crossing") {
    val st = freshStore()
    seedDbl(st)
    def bits(d: Double) = ZoneMaps.sortableDoubleBits(d)
    // probe straddling the negative/positive boundary: bands 2 and 3
    val kept = ZoneMaps.keptDirsTagged(st, "dbl", "dv", "d64:",
      bits(-50.0), bits(0.5))
    assert(kept.size == 2, s"expected 2 of 6 dirs kept, got ${kept.size}")
    val pruned = ZoneMaps.readRangeDouble(st, "dbl", "dv", -50.0, 0.5)
    val full = st.read("dbl").filter(col("dv").between(-50.0, 0.5))
    assert(pruned.count() == 51)
    assert(pruned.except(full).isEmpty && full.except(pruned).isEmpty)
    assert(ZoneMaps.keptDirsTagged(st, "dbl", "dv", "d64:",
      bits(1e6), bits(2e6)).isEmpty)
    // transparent: plain double comparisons prune through d64
    val rule = graft.plans.AutoSkip.install(spark, st)
    try {
      def roots(df: DataFrame): Seq[Int] =
        df.queryExecution.optimizedPlan.collect {
          case org.apache.spark.sql.execution.datasources.LogicalRelation(
            h: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
            _, _, _, _) => h.location.rootPaths.size
        }
      val rng = st.read("dbl").filter(col("dv") >= -50.0 && col("dv") < 0.5)
      assert(roots(rng) == Seq(2), s"double range did not prune: ${roots(rng)}")
      assert(rng.count() == 51)
    } finally graft.plans.AutoSkip.uninstall(spark, rule)
  }

  test("double zone maps conservatism: NaN, signed zero, all-null, and unstampable types stay sound") {
    val st = freshStore()
    import spark.implicits._
    // band 0: ordinary values; band 1: all NaN; band 2: all -0.0;
    // band 3: all-null
    ZoneMaps.createTracked(st, "c",
      Seq((1.0, 1L), (2.0, 2L)).toDF("dv", "v"), Seq("dv"))
    st.insert("c", Seq((Double.NaN, 3L), (Double.NaN, 4L)).toDF("dv", "v"))
    st.insert("c", Seq((-0.0, 5L)).toDF("dv", "v"))
    st.insert("c", spark.range(1)
      .select(lit(null).cast("double").as("dv"), lit(6L).as("v")))
    def bits(d: Double) = ZoneMaps.sortableDoubleBits(d)
    // dv <= 5.0: the all-NaN dir must PRUNE (both engines order NaN
    // greatest, so no NaN satisfies ≤), the null dir prunes via the
    // sentinel, bands 0 and 2 keep
    val leKept = ZoneMaps.keptDirsTagged(st, "c", "dv", "d64:",
      Long.MinValue, bits(5.0))
    assert(leKept.size == 2, s"NaN/null dirs must prune from <=: $leKept")
    // dv >= 1.5: the all-NaN dir must KEEP (NaN >= x is TRUE in both
    // engines' NaN-greatest ordering) — parity proves it
    val geKept = ZoneMaps.keptDirsTagged(st, "c", "dv", "d64:",
      bits(1.5), Long.MaxValue)
    assert(geKept.size == 2, s"NaN dir must keep under >=: $geKept")
    val ge = ZoneMaps.readRangeDouble(st, "c", "dv", 1.5, Double.MaxValue)
    // between excludes NaN (NaN <= hi is false), matching the stamp
    // only when hi's bits sit below NaN's — the unpruned filter agrees
    val geFull = st.read("c")
      .filter(col("dv").between(1.5, Double.MaxValue))
    assert(ge.except(geFull).isEmpty && geFull.except(ge).isEmpty)
    // signed zero: the -0.0 dir stamps normalized +0.0 bits, so the
    // probe dv >= 0.0 KEEPS it (the engines compare -0.0 == 0.0)
    val zeroKept = ZoneMaps.keptDirsTagged(st, "c", "dv", "d64:",
      bits(0.0), Long.MaxValue)
    assert(zeroKept.size == 3, s"-0.0 dir must keep under >= 0.0: $zeroKept")
    val z = ZoneMaps.readRangeDouble(st, "c", "dv", 0.0, 10.0)
    val zFull = st.read("c").filter(col("dv").between(0.0, 10.0))
    assert(z.except(zFull).isEmpty && zFull.except(z).isEmpty)
    assert(z.filter(col("v") === 5L).count() == 1,
      "the -0.0 row must answer the >= 0.0 probe")
    // an unstampable tracked type (TIMESTAMP_NTZ) stamps the explicit
    // 'u' marker once — kept on every probe, never re-aggregated
    val st2 = freshStore()
    ZoneMaps.createTracked(st2, "ntz", spark.range(3)
      .select(expr("timestamp_ntz '2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id)").as("nts"),
        col("id").as("v")), Seq("nts"))
    val marks = st2.tableProps("ntz").filter { case (k, v) =>
      k.startsWith("zm.") && v == "u" }
    assert(marks.size == 1, s"expected one unstampable marker: $marks")
    assert(ZoneMaps.keptDirsTagged(st2, "ntz", "nts", "t64:",
      Long.MinValue, Long.MaxValue).size == 1)
  }

  test("transparent string pruning: plain filtered reads route prefix and range through the stamps") {
    val st = freshStore()
    seedString(st)
    val rule = graft.plans.AutoSkip.install(spark, st)
    try {
      def roots(df: DataFrame): Seq[Int] =
        df.queryExecution.optimizedPlan.collect {
          case org.apache.spark.sql.execution.datasources.LogicalRelation(
            h: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
            _, _, _, _) => h.location.rootPaths.size
        }
      // LIKE 'key-0001%' simplifies to StartsWith and prunes to band 1
      val pre = st.read("s").filter(col("name").like("key-0001%"))
      assert(roots(pre) == Seq(1), s"prefix did not prune: ${roots(pre)}")
      assert(pre.count() == 100)
      // an explicit range prunes to the two overlapping bands
      val rng = st.read("s")
        .filter(col("name") >= "key-000250" && col("name") < "key-000301")
      assert(roots(rng) == Seq(2), s"range did not prune: ${roots(rng)}")
      assert(rng.count() == 51)
      // string equality prunes through the degenerate interval even
      // with no Bloom stamps on the table
      val eq = st.read("s").filter(col("name") === "key-000450")
      assert(roots(eq) == Seq(1), s"equality did not prune: ${roots(eq)}")
      assert(eq.count() == 1)
    } finally graft.plans.AutoSkip.uninstall(spark, rule)
  }
}
