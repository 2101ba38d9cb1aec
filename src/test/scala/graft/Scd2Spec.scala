package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.store.{Scd2, TableStore}

/** SCD2 invariants the m7 oracle can't see from the final table alone:
  * exactly one open row per key at every step, interval adjacency,
  * zero churn for unchanged keys (file-level: untouched dirs are
  * carried by reference), new-key arrival mid-stream, null-safe
  * attribute comparison, and the as-of read. */
class Scd2Spec extends SparkSpec {

  private def freshStore(): TableStore =
    new TableStore(spark, Files.createTempDirectory("graft-scd2-").toString)

  private def dim(rows: Seq[(Long, String, java.lang.Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("k", "seg", "score")
  }

  test("change sequence: close + append per changed key, one open row per key") {
    val st = freshStore()
    Scd2.init(st, "d", dim(Seq((1L, "A", 10L), (2L, "B", 20L))), 1000L)
    // key 1 changes, key 2 unchanged, key 3 arrives
    Scd2.applyBatch(st, "d",
      dim(Seq((1L, "A2", 10L), (2L, "B", 20L), (3L, "C", 30L))), Seq("k"), 2000L)
    val t = st.read("d").collect().map(r => (r.getLong(0), r.getString(1),
      r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4), r.getBoolean(5))).toSet
    assert(t == Set(
      (1L, "A", 1000L, 2000L, false),
      (1L, "A2", 2000L, -1L, true),
      (2L, "B", 1000L, -1L, true),
      (3L, "C", 2000L, -1L, true)), s"unexpected history: $t")
    // exactly one open row per key
    val open = st.read("d").filter(col("is_current"))
      .groupBy("k").count().filter(col("count") =!= 1)
    assert(open.isEmpty)
  }

  test("a no-change snapshot is a no-op commit (zero churn, dirs untouched)") {
    val st = freshStore()
    Scd2.init(st, "d", dim(Seq((1L, "A", 10L), (2L, "B", 20L))), 1000L)
    val dirsBefore = st.dataDirs("d").toSet
    Scd2.applyBatch(st, "d", dim(Seq((1L, "A", 10L), (2L, "B", 20L))),
      Seq("k"), 2000L)
    assert(st.dataDirs("d").toSet == dirsBefore,
      "an all-unchanged batch must not rewrite or append any dir")
    assert(st.read("d").count() == 2)
  }

  test("null-safe attribute compare: null==null is unchanged, null->value is a change") {
    val st = freshStore()
    Scd2.init(st, "d", dim(Seq((1L, "A", null), (2L, "B", null))), 1000L)
    Scd2.applyBatch(st, "d", dim(Seq((1L, "A", null), (2L, "B", 5L))),
      Seq("k"), 2000L)
    assert(st.read("d").filter(col("k") === 1L).count() == 1,
      "null==null must be unchanged")
    assert(st.read("d").filter(col("k") === 2L).count() == 2,
      "null->value must open a new version")
  }

  test("a snapshot with duplicated business keys is rejected whole") {
    val st = freshStore()
    Scd2.init(st, "d", dim(Seq((1L, "A", 10L))), 1000L)
    // two rows for key 1 would append two OPEN versions — admission
    // refuses the whole batch, nothing commits
    val e = intercept[IllegalArgumentException] {
      Scd2.applyBatch(st, "d",
        dim(Seq((1L, "A2", 10L), (1L, "A3", 11L), (2L, "B", 20L))),
        Seq("k"), 2000L)
    }
    assert(e.getMessage.contains("duplicated business key"))
    assert(st.read("d").count() === 1, "a rejected snapshot must commit nothing")
    assert(st.read("d").filter(col("is_current")).count() === 1)
  }

  test("asOf returns the covering version at any instant") {
    val st = freshStore()
    Scd2.init(st, "d", dim(Seq((1L, "A", 10L))), 1000L)
    Scd2.applyBatch(st, "d", dim(Seq((1L, "A2", 10L))), Seq("k"), 2000L)
    Scd2.applyBatch(st, "d", dim(Seq((1L, "A3", 10L))), Seq("k"), 3000L)
    def segAt(ts: Long): Seq[String] =
      Scd2.asOf(st, "d", ts).select("seg").collect().map(_.getString(0)).toSeq
    assert(segAt(999L).isEmpty, "before the first version: nothing")
    assert(segAt(1000L) == Seq("A") && segAt(1999L) == Seq("A"))
    assert(segAt(2000L) == Seq("A2") && segAt(2500L) == Seq("A2"))
    assert(segAt(3000L) == Seq("A3") && segAt(999999L) == Seq("A3"))
  }
}
