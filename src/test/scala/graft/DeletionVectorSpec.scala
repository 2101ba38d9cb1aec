package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.store.{MaterializedView, TableStore, ZoneMaps}

/** Merge-on-read DELETE via deletion vectors
  * ([[graft.store.TableStore.deleteMor]]): the adm17 gate proves the
  * visible semantics against the DuckDB oracle; these specs pin the
  * physical properties the oracle cannot see — that a MOR delete
  * rewrites ZERO data dirs (the property that makes a scattered delete
  * of a 100 TB table affordable), that every other store mechanism
  * (compaction, vintage folds, COW, vacuum, clone, backup, zone-map
  * reads, time travel, view maintenance) composes with tombstones
  * without resurrecting or double-deleting rows, and that vector debt
  * stays bounded. */
class DeletionVectorSpec extends SparkSpec {

  private def scratch(): TableStore =
    new TableStore(spark, Files.createTempDirectory("graft-dv-").toString)

  private def orders: DataFrame =
    spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).sorted.toSeq

  test("MOR delete rewrites zero data dirs and matches COW delete") {
    val st = scratch()
    st.create("t", orders.filter(col("o_orderkey") % 3 =!= 0))
    st.insert("t", orders.filter(col("o_orderkey") % 3 === 0))
    st.create("cow", st.read("t"))
    val dirsBefore = st.dataDirs("t")

    val cond = col("cents") % 5 === 2
    st.deleteMor("t", cond)
    st.delete("cow", cond)

    assert(st.dataDirs("t") === dirsBefore,
      "MOR delete must not add, drop, or rewrite any data dir")
    assert(st.deletionVectorDirs("t").size === 1)
    assert(sortedRows(st.read("t")) === sortedRows(st.read("cow")),
      "MOR and COW delete must agree row-for-row")
  }

  test("tombstones are point-in-time: later inserts matching an old predicate stay") {
    val st = scratch()
    st.create("t", orders.filter(col("o_orderkey") <= 100))
    st.deleteMor("t", col("o_orderkey") % 2 === 0)
    // rows that WOULD have matched, arriving after the delete
    st.insert("t", orders.filter(
      col("o_orderkey") > 100 && col("o_orderkey") <= 120))
    val got = st.read("t").agg(
      sum(when(col("o_orderkey") > 100, 1).otherwise(0)),
      sum(when(col("o_orderkey") <= 100 && col("o_orderkey") % 2 === 0, 1)
        .otherwise(0))).collect().head
    val lateEven = orders.filter(
      col("o_orderkey") > 100 && col("o_orderkey") <= 120).count()
    assert(got.getLong(0) === lateEven,
      "a deletion vector is not a filter: post-delete inserts must stay")
    assert(got.getLong(1) === 0L, "tombstoned rows must be gone")
  }

  test("applyDeletes rewrites only touched dirs and drops the vectors") {
    val st = scratch()
    // two dirs with disjoint key ranges; the delete hits only the first
    st.create("t", orders.filter(col("o_orderkey") <= 200))
    st.insert("t", orders.filter(col("o_orderkey") > 200))
    val secondDir = st.dataDirs("t").toSet -- Set(st.dataDirs("t").head)
    st.deleteMor("t", col("o_orderkey") <= 200 && col("o_orderkey") % 7 === 1)
    val expect = sortedRows(st.read("t"))

    val rewritten = st.applyDeletes("t")
    assert(rewritten === 1, s"only the hit dir may be rewritten, got $rewritten")
    assert(st.deletionVectorDirs("t").isEmpty, "@dv lines must drop")
    assert(secondDir.subsetOf(st.dataDirs("t").toSet),
      "the untouched dir must carry by reference")
    assert(sortedRows(st.read("t")) === expect, "applyDeletes is result-invariant")
    assert(st.applyDeletes("t") === 0, "idempotent when no vectors remain")
  }

  test("compaction folds through vectors — tombstoned rows never resurrect") {
    val st = scratch()
    st.create("t", orders.filter(col("o_orderkey") % 4 === 0))
    (1 to 3).foreach(r => st.insert("t", orders.filter(col("o_orderkey") % 4 === r)))
    st.deleteMor("t", col("cents") % 3 === 0)
    val expect = sortedRows(st.read("t"))
    val stats = st.compact("t")
    assert(stats.dirsFolded >= 2, "precondition: compaction actually folded dirs")
    assert(sortedRows(st.read("t")) === expect,
      "folded files get new paths; vectors must apply during the fold")
  }

  test("insert vintage fold applies vectors and clears the debt") {
    val st = scratch()
    // runs only split at op lines — interleave an alter so the next
    // insert trips the cap and folds the pre-existing log
    spark.conf.set("spark.graft.store.maxVintageRuns", "1")
    try {
      st.create("t", orders.filter(col("o_orderkey") % 4 === 0))
      st.deleteMor("t", col("o_orderkey") % 8 === 0)
      st.addColumn("t", "flag", "INT", Some("7"))
      val expectPreInsert = sortedRows(st.read("t"))
      val late = orders.filter(col("o_orderkey") % 4 === 1)
        .withColumn("flag", lit(7))
      st.insert("t", late)
      assert(st.deletionVectorDirs("t").isEmpty,
        "the fold materializes visibility — @dv lines must drop")
      val got = sortedRows(st.read("t"))
      val want = (expectPreInsert ++ sortedRows(late)).sorted
      assert(got === want, "the vintage fold must keep tombstones applied")
    } finally spark.conf.unset("spark.graft.store.maxVintageRuns")
  }

  test("vector debt stays bounded: old vectors fold into one dir") {
    val st = scratch()
    st.create("t", orders)
    (0 until TableStore.MaxDvEntries + 3).foreach { i =>
      st.deleteMor("t", col("o_orderkey") % 50 === i)
    }
    assert(st.deletionVectorDirs("t").size <= TableStore.MaxDvEntries,
      "accumulated vectors must fold, not grow without bound")
    val live = st.read("t")
      .filter(col("o_orderkey") % 50 < TableStore.MaxDvEntries + 3)
      .count()
    assert(live === 0L, "every issued delete must still apply after folds")
  }

  test("vacuum keeps vector dirs; time travel sees pre-delete rows") {
    val st = scratch()
    st.create("t", orders)
    val before = st.read("t").count()
    st.deleteMor("t", col("o_orderkey") % 2 === 0)
    val after = st.read("t").count()
    st.vacuum(retainVersions = 2, graceMillis = 0L)
    assert(st.read("t").count() === after,
      "vacuum must treat @dv dirs as live — reclaiming one resurrects rows")
    assert(st.readVersion("t", 1).count() === before,
      "the pre-delete version must still read in full")
  }

  test("clone shares tombstones by reference; base purge doesn't move the clone") {
    val st = scratch()
    st.create("t", orders)
    st.deleteMor("t", col("cents") % 4 === 1)
    st.cloneTable("t", "dev")
    val devBefore = sortedRows(st.read("dev"))
    assert(devBefore === sortedRows(st.read("t")),
      "a clone must see the base's visibility, zero-copy")
    st.applyDeletes("t")
    st.vacuum(retainVersions = 1, graceMillis = 0L)
    assert(sortedRows(st.read("dev")) === devBefore,
      "the clone's referenced data+vector dirs must survive the base purge")
  }

  test("incremental backup ships vectors; restore equals source") {
    val st = scratch()
    st.create("t", orders)
    st.deleteMor("t", col("o_orderkey") % 3 === 1)
    val dest = Files.createTempDirectory("graft-dv-bak-").toString
    st.exportIncremental("t", dest)
    val restored = new TableStore(spark, dest)
    assert(sortedRows(restored.read("t")) === sortedRows(st.read("t")),
      "a restore missing the vectors would resurrect deleted rows")
  }

  test("zone-map pruned reads apply vectors") {
    val st = scratch()
    ZoneMaps.createTracked(st, "t",
      orders.filter(col("o_orderkey") <= 500), Seq("o_orderkey"))
    st.insert("t", orders.filter(col("o_orderkey") > 500))
    st.deleteMor("t", col("o_orderkey").between(10, 20))
    val got = ZoneMaps.readRange(st, "t", "o_orderkey", 1, 100).count()
    val want = st.read("t").filter(col("o_orderkey").between(1, 100)).count()
    assert(got === want,
      "the pruned read path must not bypass deletion vectors")
  }

  test("registered views refresh on MOR delete in the same commit") {
    val st = scratch()
    st.create("base", orders)
    MaterializedView.register(st, "mv", "base",
      MaterializedView.MvDef(Seq("o_custkey"), Seq("__cents" -> "cents")))
    val commits = st.commitCount()
    st.deleteMor("base", col("cents") % 2 === 0)
    assert(st.commitCount() === commits + 1, "delete + view refresh = ONE commit")
    val want = sortedRows(st.read("base").groupBy("o_custkey")
      .agg(count(lit(1)).as("n_rows"), sum("cents").as("__cents")))
    assert(sortedRows(st.read("mv")) === want,
      "the maintained view must reflect the MOR delete")
  }
}
