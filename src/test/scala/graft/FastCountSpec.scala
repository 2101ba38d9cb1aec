package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.store.TableStore

/** Metadata-only row counts ([[graft.store.TableStore.fastCount]]):
  * correctness through every mutation kind, steady-state zero-commit
  * behavior, stamp pruning, and the load-bearing claim itself — once
  * stamped, the count answers WITHOUT the data files (we physically
  * move them away and ask again). */
class FastCountSpec extends SparkSpec {

  private def scratch(): TableStore =
    new TableStore(spark, Files.createTempDirectory("graft-fc-").toString)

  private def orders: DataFrame =
    spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))

  test("fast count tracks inserts, MOR deletes, COW deletes, and compaction") {
    val st = scratch()
    st.create("t", orders.filter(col("o_orderkey") % 3 === 0))
    assert(st.fastCount("t") === st.read("t").count())
    st.insert("t", orders.filter(col("o_orderkey") % 3 === 1))
    assert(st.fastCount("t") === st.read("t").count())
    st.deleteMor("t", col("cents") % 5 === 2)
    assert(st.fastCount("t") === st.read("t").count())
    st.delete("t", col("cents") % 7 === 3) // COW: dirs replaced
    assert(st.fastCount("t") === st.read("t").count())
    st.insert("t", orders.filter(col("o_orderkey") % 3 === 2))
    st.compact("t")
    assert(st.fastCount("t") === st.read("t").count())
  }

  test("steady state is zero-commit; stale stamps prune") {
    val st = scratch()
    st.create("t", orders.filter(col("o_orderkey") % 2 === 0))
    st.insert("t", orders.filter(col("o_orderkey") % 2 === 1))
    st.fastCount("t") // stamps both dirs
    val commits = st.commitCount()
    assert(st.fastCount("t") === orders.count())
    assert(st.commitCount() === commits, "a stamped count must not commit")
    // a COW rewrite replaces every dir; the next count restamps and
    // prunes the dead keys
    st.delete("t", col("cents") % 4 === 1)
    st.fastCount("t")
    val rowKeys = st.tableProps("t").keys.filter(_.startsWith("rows."))
    assert(rowKeys.map(_.drop(5)).toSet === st.dataDirs("t").toSet,
      "exactly one rows.* stamp per live dir — stale keys must prune")
  }

  test("a stamped count answers without the data files") {
    val st = scratch()
    st.create("t", orders.filter(col("o_orderkey") % 2 === 0))
    st.insert("t", orders.filter(col("o_orderkey") % 2 === 1))
    st.deleteMor("t", col("cents") % 5 === 0)
    val expect = st.read("t").count()
    assert(st.fastCount("t") === expect) // stamps
    // move every DATA dir away (vector dirs stay — they're the
    // tombstone metadata the count legitimately reads)
    val parked = Files.createTempDirectory("graft-fc-park-")
    val dirs = st.dataDirs("t")
    dirs.foreach { d =>
      Files.move(Path.of(st.root, "t", d), parked.resolve(d))
    }
    try assert(st.fastCount("t") === expect,
      "the count must come from the manifest, not the data files")
    finally dirs.foreach { d =>
      Files.move(parked.resolve(d), Path.of(st.root, "t", d))
    }
    assert(st.read("t").count() === expect, "fixture restored")
  }

  test("clones fast-count through cross-table dir refs") {
    val st = scratch()
    st.create("t", orders)
    st.deleteMor("t", col("cents") % 3 === 1)
    st.cloneTable("t", "dev")
    assert(st.fastCount("dev") === st.read("dev").count())
    st.insert("dev", orders.limit(0)) // diverge trivially
    assert(st.fastCount("dev") === st.read("t").count())
  }
}
