package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.store.{BloomSkipping, TableStore, ZoneMaps}

/** Manifest-level Bloom skipping: an equality probe opens only the
  * commits whose filter may hold the key — including the hash/entity-
  * banded layout zone maps are blind to — with parity against the
  * unpruned filter across mutations, and the conservative fallbacks
  * (untracked dirs kept, schema ops disable pruning, MOR deletes stay
  * invisible). */
class BloomSpec extends SparkSpec {

  private def freshStore(): TableStore =
    new TableStore(spark, Files.createTempDirectory("graft-bf-").toString)

  /** Entity-banded ingest: mod-sliced inserts so EVERY commit spans
    * the full key range (zone maps prune nothing here) but holds a
    * disjoint key SET — the layout the Bloom layer exists for. */
  private def seed(st: TableStore, bands: Int = 6, perBand: Int = 100): Unit = {
    def band(i: Int): DataFrame = spark.range(0, bands.toLong * perBand)
      .filter(col("id") % bands === i)
      .select(col("id").as("k"), (col("id") % 7).as("v"))
    BloomSkipping.createTracked(st, "t", band(0), Seq("k"), bits = 1 << 12)
    (1 until bands).foreach(i => st.insert("t", band(i)))
  }

  test("a point probe keeps exactly the key's commit; zone maps could not prune here") {
    val st = freshStore()
    seed(st)
    assert(st.read("t").count() == 600)
    // key 250 lives in band 250 % 6 = 4 only
    val kept = BloomSkipping.keptDirs(st, "t", "k", 250L)
    assert(kept.size == 1, s"expected 1 of 6 dirs kept, got ${kept.size}")
    val pruned = BloomSkipping.readEquals(st, "t", "k", 250L)
    val full = st.read("t").filter(col("k") === 250L)
    assert(pruned.count() == 1)
    assert(pruned.except(full).isEmpty && full.except(pruned).isEmpty)
    // an absent key keeps nothing (h=4 over 2^12 bits: fp ~7e-5,
    // deterministic hashes so this assertion cannot flake)
    assert(BloomSkipping.keptDirs(st, "t", "k", 10000L).isEmpty)
    assert(BloomSkipping.readEquals(st, "t", "k", 10000L).count() == 0)
    // the contrast that motivates the layer: every mod-band spans the
    // full [0, 600) range, so a zone-map range probe keeps ALL dirs
    val zst = freshStore()
    def band(i: Int): DataFrame = spark.range(0, 600)
      .filter(col("id") % 6 === i)
      .select(col("id").as("k"), (col("id") % 7).as("v"))
    ZoneMaps.createTracked(zst, "t", band(0), Seq("k"))
    (1 until 6).foreach(i => zst.insert("t", band(i)))
    assert(ZoneMaps.keptDirs(zst, "t", "k", 250, 250).size == 6)
  }

  test("a copy-on-write rewrite loses its filter conservatively, answers stay exact") {
    val st = freshStore()
    seed(st)
    st.update("t", Map("v" -> lit(99L)), col("k") === 150L)
    // 150 % 6 = 0: band 0's dir was rewritten, its replacement has no
    // stamp and must be kept by EVERY probe
    val keptOther = BloomSkipping.keptDirs(st, "t", "k", 250L)
    assert(keptOther.size >= 2, s"key dir + unstamped rewrite dirs: $keptOther")
    val pruned = BloomSkipping.readEquals(st, "t", "k", 150L)
    assert(pruned.count() == 1 && pruned.head.getLong(1) == 99L)
    BloomSkipping.retrack(st, "t")
    assert(BloomSkipping.keptDirs(st, "t", "k", 250L).size == 1,
      "re-tracked table must prune like the original")
    assert(BloomSkipping.keptDirs(st, "t", "k", 150L).size == 1)
  }

  test("pending schema ops disable pruning, the fallback read stays exact") {
    val st = freshStore()
    seed(st)
    st.addColumn("t", "v2", "BIGINT", Some("v * 2"))
    val got = BloomSkipping.readEquals(st, "t", "k", 250L)
    val full = st.read("t").filter(col("k") === 250L)
    assert(got.columns.contains("v2"), "fallback must read the evolved schema")
    assert(got.except(full).isEmpty && full.except(got).isEmpty)
  }

  test("an all-null tracked dir stamps a sentinel and prunes; one stamp per dir") {
    val st = freshStore()
    seed(st, bands = 2)
    st.insert("t", spark.range(0, 10)
      .select(lit(null).cast("long").as("k"), col("id").as("v")))
    val sentinels = st.tableProps("t").filter { case (key, v) =>
      key.startsWith("bf.") && v == "-" }
    assert(sentinels.size === 1,
      s"all-null dir must stamp the no-members sentinel: " +
        s"${st.tableProps("t").filter(_._1.startsWith("bf."))}")
    assert(BloomSkipping.keptDirs(st, "t", "k", 0L).size === 1)
    // later inserts stamp only their own dir (the sentinel is final)
    st.insert("t", spark.range(200, 210)
      .select(col("id").as("k"), (col("id") % 7).as("v")))
    val bf = st.tableProps("t").keys.count(_.startsWith("bf."))
    assert(bf === st.dataDirs("t").size, "exactly one stamp per current dir")
  }

  test("stale bf stamps prune from the prop map after a rewrite") {
    val st = freshStore()
    seed(st)
    assert(st.tableProps("t").keys.count(_.startsWith("bf.")) === 6)
    st.update("t", Map("v" -> lit(99L)), col("k") === 150L)
    BloomSkipping.retrack(st, "t")
    val dirs = st.dataDirs("t").toSet
    val keys = st.tableProps("t").keys.filter(_.startsWith("bf.")).toSeq
    assert(keys.size === dirs.size,
      s"one live stamp per current dir, no stale keys: $keys")
    assert(keys.forall(k => dirs.exists(d => k == s"bf.$d.k")),
      s"every stamp must name a current dir: $keys vs $dirs")
  }

  test("batch IN-list probe opens the union of the keys' commits, answers exactly") {
    val st = freshStore()
    seed(st)
    // 250 and 251 live in bands 4 and 5; the batch probe must open
    // exactly their two dirs (one hash job for the whole list)
    val kept = BloomSkipping.keptDirsIn(st, "t", "k", Seq(250L, 251L))
    assert(kept.size == 2, s"expected the 2 key bands kept, got $kept")
    val pruned = BloomSkipping.readIn(st, "t", "k", Seq(250L, 251L, 10000L))
    val full = st.read("t").filter(col("k").isin(250L, 251L, 10000L))
    assert(pruned.count() == 2)
    assert(pruned.except(full).isEmpty && full.except(pruned).isEmpty)
    // an empty key list reads nothing; an all-absent list prunes all
    assert(BloomSkipping.readIn(st, "t", "k", Nil).count() == 0)
    assert(BloomSkipping.keptDirsIn(st, "t", "k", Seq(10000L, 20000L)).isEmpty)
  }

  test("MOR-deleted rows stay invisible through the pruned read") {
    val st = freshStore()
    seed(st)
    st.deleteMor("t", col("k") === 250L)
    // the data dirs are untouched (the filter stays a sound
    // over-approximation); visibility must come from the vectors
    assert(BloomSkipping.keptDirs(st, "t", "k", 250L).size == 1)
    assert(BloomSkipping.readEquals(st, "t", "k", 250L).count() == 0)
    assert(BloomSkipping.readEquals(st, "t", "k", 256L).count() == 1)
  }
}
