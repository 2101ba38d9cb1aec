package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.plans.AutoSkip
import graft.store.{BloomSkipping, TableStore, ZoneMaps}

/** Transparent data skipping on the PLAIN read path: a
  * `store.read(t).filter(...)` — or a HeroQL atom with a bound
  * argument — prunes to the manifest-stamp-kept dirs with no
  * `readEquals`/`readRange` call, with exact parity against the
  * unpruned read and conservative fallbacks (untracked columns,
  * kill-switch conf, non-store scans untouched). */
class AutoSkipSpec extends SparkSpec {

  private def freshStore(): TableStore =
    new TableStore(spark, Files.createTempDirectory("graft-askip-").toString)

  /** Root-path count of every parquet scan in the optimized plan
    * (the pruning rule is an optimizer rule, so the optimized plan is
    * the authoritative surface), plus whether it collapsed to an
    * empty local relation. */
  private def scanRoots(df: DataFrame): Seq[Int] =
    df.queryExecution.optimizedPlan.collect {
      case LogicalRelation(h: HadoopFsRelation, _, _, _, _) =>
        h.location.rootPaths.size
    }

  private def withRule[A](st: TableStore)(body: => A): A = {
    val rule = AutoSkip.install(spark, st)
    try body finally AutoSkip.uninstall(spark, rule)
  }

  /** Entity-banded ingest: every commit spans the full key range but
    * holds a disjoint key SET (the Bloom layout). */
  private def seedBanded(st: TableStore, bands: Int = 6): Unit = {
    def band(i: Int): DataFrame = spark.range(0, bands * 100L)
      .filter(col("id") % bands === i)
      .select(col("id").as("k"), (col("id") % 7).as("v"))
    BloomSkipping.createTracked(st, "t", band(0), Seq("k"), bits = 1 << 12)
    (1 until bands).foreach(i => st.insert("t", band(i)))
  }

  test("plain read + equality filter prunes to the Bloom-kept dirs, answers unchanged") {
    val st = freshStore()
    seedBanded(st)
    withRule(st) {
      val df = st.read("t").filter(col("k") === 250L)
      assert(scanRoots(df) == Seq(1),
        s"expected 1 kept dir of 6, scan roots: ${scanRoots(df)}")
      assert(df.collect().toSeq == Seq(Row(250L, 250L % 7)))
      // absent key: every dir pruned, scan collapses to empty
      val none = st.read("t").filter(col("k") === 10000L)
      assert(scanRoots(none).isEmpty &&
        none.queryExecution.optimizedPlan.collectFirst {
          case l: LocalRelation => l }.nonEmpty ||
        none.count() == 0)
      assert(none.count() == 0)
      // untracked column: conservative, all 6 dirs stay
      assert(scanRoots(st.read("t").filter(col("v") === 3L)) == Seq(6))
    }
    // without the rule, nothing prunes (and the answer is the baseline)
    assert(scanRoots(st.read("t").filter(col("k") === 250L)) == Seq(6))
  }

  test("IN-list filter prunes to the union of the keys' dirs") {
    val st = freshStore()
    seedBanded(st)
    withRule(st) {
      // 250→band 4, 251→band 5: two dirs of six
      val df = st.read("t").filter(col("k").isin(250L, 251L))
      assert(scanRoots(df) == Seq(2), s"scan roots: ${scanRoots(df)}")
      assert(df.orderBy("k").collect().toSeq ==
        Seq(Row(250L, 250L % 7), Row(251L, 251L % 7)))
    }
  }

  test("OR of point probes on one column normalizes to an IN-list; mixed-column ORs refuse") {
    val st = freshStore()
    seedBanded(st)
    withRule(st) {
      // k = 250 OR k = 251 — the hand-written IN: two dirs of six
      val or2 = st.read("t").filter(col("k") === 250L || col("k") === 251L)
      assert(scanRoots(or2) == Seq(2), s"scan roots: ${scanRoots(or2)}")
      assert(or2.orderBy("k").collect().toSeq ==
        Seq(Row(250L, 250L % 7), Row(251L, 251L % 7)))
      // a branch that is itself an IN folds into the union
      val orIn = st.read("t")
        .filter(col("k") === 250L || col("k").isin(251L, 252L))
      assert(scanRoots(orIn) == Seq(3), s"scan roots: ${scanRoots(orIn)}")
      assert(orIn.count() == 3)
      // mixed-column OR: a disjunct the stamps can't see could match
      // anywhere — conservative refusal, all 6 dirs stay, answer exact
      val mixed = st.read("t").filter(col("k") === 250L || col("v") === 3L)
      assert(scanRoots(mixed) == Seq(6), s"scan roots: ${scanRoots(mixed)}")
      assert(mixed.count() ==
        st.read("t").filter(col("k") === 250L || col("v") === 3L).count())
      // non-point branch (a range) refuses too
      val nonPoint = st.read("t").filter(col("k") === 250L || col("k") > 500L)
      assert(scanRoots(nonPoint) == Seq(6), s"scan roots: ${scanRoots(nonPoint)}")
    }
  }

  test("range filter prunes through zone-map stamps on ordered ingest") {
    val st = freshStore()
    def slice(i: Int): DataFrame = spark.range(i * 100L, (i + 1) * 100L)
      .select(col("id").as("ts"), (col("id") * 2).as("v"))
    ZoneMaps.createTracked(st, "e", slice(0), Seq("ts"))
    (1 until 6).foreach(i => st.insert("e", slice(i)))
    withRule(st) {
      val df = st.read("e").filter(col("ts").between(150L, 249L))
      assert(scanRoots(df) == Seq(2), s"scan roots: ${scanRoots(df)}")
      assert(df.count() == 100)
      assert(df.agg(sum("v")).head.getLong(0) == (150L until 250L).map(_ * 2).sum)
      // strict comparisons prune too (`>` 399 excludes dir [300,399])
      val gt = st.read("e").filter(col("ts") > 399L && col("ts") < 500L)
      assert(scanRoots(gt) == Seq(1), s"scan roots: ${scanRoots(gt)}")
      assert(gt.count() == 100)
    }
  }

  test("string-key Bloom stamps prune a string-banded layout (adm24's shape)") {
    val st = freshStore()
    def band(i: Int): DataFrame = spark.range(0, 600)
      .filter(col("id") % 6 === i)
      .select(concat(lit("user-"), col("id")).as("uid"), col("id").as("v"))
    BloomSkipping.createTracked(st, "u", band(0), Seq("uid"), bits = 1 << 12)
    (1 until 6).foreach(i => st.insert("u", band(i)))
    // explicit API first: the stamp/probe string-hash contract
    val kept = BloomSkipping.keptDirsString(st, "u", "uid", "user-250")
    assert(kept.size == 1, s"expected 1 of 6 dirs kept, got ${kept.size}")
    val pruned = BloomSkipping.readEquals(st, "u", "uid", "user-250")
    assert(pruned.collect().toSeq == Seq(Row("user-250", 250L)))
    assert(BloomSkipping.keptDirsString(st, "u", "uid", "user-9999").isEmpty)
    // and transparently from a plain filtered read
    withRule(st) {
      val df = st.read("u").filter(col("uid") === "user-250")
      assert(scanRoots(df) == Seq(1), s"scan roots: ${scanRoots(df)}")
      assert(df.collect().toSeq == Seq(Row("user-250", 250L)))
    }
  }

  test("a parsed HeroQL atom with a bound argument routes through the stamps") {
    val st = freshStore()
    seedBanded(st)
    withRule(st) {
      val program =
        """data Events(k: int64, v: int64).
          |query Hit() -> (k: int64, v: int64)
          |:- Events(k, v), k == 250.""".stripMargin
      val df = graft.heroql.HeroQL.compile(program, "Hit",
        Map("Events" -> st.read("t")))
      assert(scanRoots(df) == Seq(1),
        s"bound-arg atom did not prune: ${scanRoots(df)}")
      assert(df.collect().toSeq == Seq(Row(250L, 250L % 7)))
    }
  }

  test("a HeroQL `in` list prunes to the union of the keys' dirs") {
    val st = freshStore()
    seedBanded(st)
    withRule(st) {
      val program =
        """data Events(k: int64, v: int64).
          |query Hits() -> (k: int64, v: int64)
          |:- Events(k, v), k in (250, 251).""".stripMargin
      val df = graft.heroql.HeroQL.compile(program, "Hits",
        Map("Events" -> st.read("t")))
      assert(scanRoots(df) == Seq(2),
        s"in-list atom did not prune: ${scanRoots(df)}")
      assert(df.orderBy("k").collect().toSeq ==
        Seq(Row(250L, 250L % 7), Row(251L, 251L % 7)))
    }
  }

  test("partitioned store: Bloom stamps on a NON-partition column prune whole commits") {
    // the fp-bucketed 100 TB corpus layout (st5b): hash-partitioned on
    // `bucket`, Bloom-tracked on the non-partition key `k`. Partition
    // pruning serves bucket filters; the manifest stamps must serve k
    // filters TRANSPARENTLY too — each commit dir is its own discovery
    // root (readDirs unions partitioned dirs), so the rule prunes
    // whole dirs per union leg.
    val st = freshStore()
    def band(i: Int): DataFrame = spark.range(0, 600L)
      .filter(col("id") % 6 === i)
      .select(col("id").as("k"), (col("id") % 4).as("bucket"),
        (col("id") % 7).as("v"))
    st.createPartitioned("pt", band(0), Seq("bucket"), Map(
      BloomSkipping.ColsProp -> "k",
      BloomSkipping.BitsProp -> (1 << 12).toString,
      BloomSkipping.HashesProp -> BloomSkipping.DefaultHashes.toString))
    BloomSkipping.retrack(st, "pt")
    (1 until 6).foreach(i => st.insert("pt", band(i)))
    withRule(st) {
      // k=250 lives in exactly one band: 5 of 6 union legs collapse
      val df = st.read("pt").filter(col("k") === 250L)
      assert(scanRoots(df) == Seq(1),
        s"expected 1 surviving leg of 6, scan roots: ${scanRoots(df)}")
      assert(df.select("k", "bucket", "v").collect().toSeq ==
        Seq(Row(250L, 250L % 4, 250L % 7)))
      // absent key: every leg pruned
      val none = st.read("pt").filter(col("k") === 10000L)
      assert(scanRoots(none).isEmpty, s"scan roots: ${scanRoots(none)}")
      assert(none.count() == 0)
      // partition-column filters still prune via Spark's own partition
      // pruning, untouched by the rule (bucket is unstamped: all legs
      // stay, but each leg opens only its bucket=2 subdir)
      val pf = st.read("pt").filter(col("bucket") === 2L)
      assert(scanRoots(pf).size == 6 && scanRoots(pf).forall(_ == 1),
        s"scan roots: ${scanRoots(pf)}")
      assert(pf.count() == (0L until 600L).count(_ % 4 == 2))
      // parity: the pruned answer equals the rule-off answer
      spark.conf.set("spark.graft.autoskip.enabled", "false")
      try {
        val base = st.read("pt").filter(col("k") === 250L).collect().toSeq
        assert(df.collect().toSeq == base)
      } finally spark.conf.unset("spark.graft.autoskip.enabled")
    }
  }

  test("a parsed HeroQL string-range predicate prunes through the zm string stamps") {
    val st = freshStore()
    def band(i: Int): DataFrame = spark.range(i * 100L, (i + 1) * 100L)
      .select(concat(lit("key-"), lpad(col("id").cast("string"), 6, "0"))
        .as("name"), col("id").as("v"))
    graft.store.ZoneMaps.createTracked(st, "s", band(0), Seq("name"))
    (1 until 6).foreach(i => st.insert("s", band(i)))
    withRule(st) {
      val program =
        """data S(name: string, v: int64).
          |query Hit() -> (name: string, v: int64)
          |:- S(name, v), name >= "key-000250", name <= "key-000300".""".stripMargin
      val df = graft.heroql.HeroQL.compile(program, "Hit",
        Map("S" -> st.read("s")))
      assert(scanRoots(df) == Seq(2),
        s"string range from text did not prune: ${scanRoots(df)}")
      assert(df.count() == 51)
    }
  }

  test("kill switch and non-store scans: no pruning, no interference") {
    val st = freshStore()
    seedBanded(st)
    withRule(st) {
      spark.conf.set("spark.graft.autoskip.enabled", "false")
      try assert(scanRoots(st.read("t").filter(col("k") === 250L)) == Seq(6))
      finally spark.conf.unset("spark.graft.autoskip.enabled")
      // a non-store parquet scan with the same filter shape is untouched
      val out = Files.createTempDirectory("graft-askip-ext-").toString
      spark.range(0, 100).select(col("id").as("k")).write
        .mode("overwrite").parquet(out)
      val ext = spark.read.parquet(out).filter(col("k") === 5L)
      assert(scanRoots(ext) == Seq(1)) // its single original root
      assert(ext.count() == 1)
    }
  }

  test("deletion vectors still apply above a transparently pruned scan") {
    val st = freshStore()
    seedBanded(st)
    st.deleteMor("t", col("k") === 250L)
    withRule(st) {
      val df = st.read("t").filter(col("k") === 250L)
      assert(df.count() == 0, "MOR-deleted row resurrected by pruning")
      val live = st.read("t").filter(col("k") === 251L)
      assert(live.collect().toSeq == Seq(Row(251L, 251L % 7)))
    }
  }
}
