package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.store.TableStore

/** Size-aware tail compaction (`TableStore.compact`) — the streaming
  * small-file countermeasure. The adm6 gate proves content fidelity;
  * these pin the PHYSICAL claims: the dir-count collapse, the
  * size-aware partial fold (big dirs carried by reference, zero bytes
  * moved), the op-line fence, partition-layout preservation, and
  * vacuum reclamation of the superseded dirs. */
class CompactionSpec extends SparkSpec {

  private def scratch() =
    new TableStore(spark, Files.createTempDirectory("graft-compact-").toString)

  private def rows(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo until hi).map(i => (i.toLong, s"payload-$i")).toDF("k", "v")
  }

  test("full fold collapses the tail to one dir; content and history survive") {
    val st = scratch()
    st.create("t", rows(0, 100))
    (1 to 4).foreach(i => st.insert("t", rows(i * 100, i * 100 + 100)))
    assert(st.dataDirs("t").size == 5)
    val stats = st.compact("t")
    assert(stats == graft.store.CompactStats(5, 0), s"got $stats")
    assert(st.dataDirs("t").size == 1)
    assert(st.read("t").count() == 500)
    // one version back is the pre-compact manifest — same content,
    // still readable from the superseded dirs
    assert(st.readVersion("t", 1).count() == 500)
    // vacuum with retention 1 reclaims the five folded-away dirs
    val vac = st.vacuum(retainVersions = 1, graceMillis = 0)
    assert(vac.dataDirsDeleted == 5, s"vacuum: $vac")
    assert(st.read("t").count() == 500)
  }

  test("size-aware fold keeps the big dir by reference, zero bytes moved") {
    val st = scratch()
    st.create("t", rows(0, 50000)) // ~hundreds of KB
    (1 to 4).foreach(i => st.insert("t", rows(50000 + i * 10, 50000 + i * 10 + 10)))
    val bigDir = st.dataDirs("t").head
    val stats = st.compact("t", smallBytes = 100 * 1024)
    assert(stats == graft.store.CompactStats(4, 1), s"got $stats")
    val after = st.dataDirs("t")
    assert(after.size == 2, s"dirs after: $after")
    // the base dir is the SAME directory — carried by reference
    assert(after.contains(bigDir), "big dir was rewritten, not referenced")
    assert(st.read("t").count() == 50040)
  }

  test("nothing small enough to fold is a no-op commit-wise") {
    val st = scratch()
    st.create("t", rows(0, 1000))
    st.insert("t", rows(1000, 2000))
    val before = st.versionCount("t")
    val stats = st.compact("t", smallBytes = 1L) // nothing is this small
    assert(stats == graft.store.CompactStats(0, 2))
    assert(st.dataDirs("t").size == 2)
    assert(st.versionCount("t") == before, "a no-op compact must not commit")
  }

  test("fold never crosses an op line: pre-alter dirs stay put, read applies ops once") {
    val st = scratch()
    st.create("t", rows(0, 100))
    st.insert("t", rows(100, 200))
    st.addColumn("t", "flag", "BIGINT", Some("k % 2"))
    // post-alter inserts arrive in the NEW logical schema (the insert
    // contract — the backfill only applies to pre-alter dirs)
    st.insert("t", rows(200, 300).withColumn("flag", col("k") % 2))
    st.insert("t", rows(300, 400).withColumn("flag", col("k") % 2))
    assert(st.dataDirs("t").size == 4)
    val stats = st.compact("t")
    // only the two post-alter dirs fold; the two pre-alter dirs must
    // stay behind the op line so the backfill still applies to them
    assert(stats == graft.store.CompactStats(2, 0), s"got $stats")
    assert(st.dataDirs("t").size == 3)
    val out = st.read("t")
    assert(out.count() == 400)
    assert(out.filter(col("flag") =!= col("k") % 2).count() == 0,
      "backfill expression no longer applies to the right rows")
  }

  test("fp streaming sink with compactEvery folds its own micro-batch dirs, same content") {
    def run(compactEvery: Int): (Set[(Long, Long)], Int, TableStore) = {
      if (compactEvery > 0) {
        spark.conf.set("spark.graft.dedup.compactEvery", compactEvery.toString)
        spark.conf.set("spark.graft.dedup.compactSmallBytes", Long.MaxValue.toString)
      }
      try {
        val st = scratch()
        val out = graft.streaming.DocStreams
          .dedupSinkToStoreByFp(spark, sf, st, "corpus")
          .select("doc_id", "fp").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        (out, st.dataDirs("corpus").size, st)
      } finally {
        spark.conf.unset("spark.graft.dedup.compactEvery")
        spark.conf.unset("spark.graft.dedup.compactSmallBytes")
      }
    }
    val (plain, plainDirs, _) = run(0)
    val (compacted, compactedDirs, st) = run(2)
    assert(compacted == plain, "compaction changed the committed content")
    assert(compactedDirs < plainDirs,
      s"compactEvery=2 left $compactedDirs dirs vs $plainDirs without")
    // the folded corpus keeps its fp_bucket layout — probes still prune
    assert(st.partitionColumns("corpus") == Seq("fp_bucket"))
  }

  test("partitioned tables keep their layout through the fold") {
    val st = scratch()
    import spark.implicits._
    def part(lo: Int, n: Int) = (lo until lo + n)
      .map(i => (i.toLong, (i % 4).toLong)).toDF("k", "b")
    st.createPartitioned("t", part(0, 100), Seq("b"))
    (1 to 3).foreach(i => st.insert("t", part(i * 100, 100)))
    val stats = st.compact("t")
    assert(stats == graft.store.CompactStats(4, 0))
    assert(st.partitionColumns("t") == Seq("b"))
    val dir = st.dataDirs("t")
    assert(dir.size == 1)
    assert(st.read("t").count() == 400)
    // the folded dir is physically partitioned: b=value subdirs exist
    val sub = Files.list(java.nio.file.Paths.get(st.root, "t", dir.head))
    val names = try {
      import scala.jdk.CollectionConverters._
      sub.iterator().asScala.map(_.getFileName.toString).toSet
    } finally sub.close()
    assert(names.exists(_.startsWith("b=")), s"no partition subdirs: $names")
  }
}
