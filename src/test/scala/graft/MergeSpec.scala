package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.store.{MaterializedView, TableStore}
import graft.store.MaterializedView.MvDef

/** Three-branch MERGE ([[graft.store.TableStore.merge]]): branch
  * parity with the relational recompute, the `src_` expression
  * namespace, dir-granular copy-on-write (untouched dirs keep their
  * bytes), multi-match refusal, and aggregate-view maintenance through
  * the facade. */
class MergeSpec extends SparkSpec {

  private def scratch(): TableStore =
    new TableStore(spark, Files.createTempDirectory("graft-merge-spec-").toString)

  private def ord: DataFrame =
    spark.read.parquet(s"$sf/orders.parquet").select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"))

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).sorted.toSeq

  test("all three branches match the relational recompute") {
    val st = scratch()
    val base = ord.filter(col("o_orderkey") % 3 === 0)
    st.create("t", base)
    val source = ord.filter(col("o_orderkey") % 3 <= 1)
      .withColumn("o_totalprice", col("o_totalprice") * 2.0)
      .withColumn("o_orderstatus", lit("M"))
    st.merge("t", source, Seq("o_orderkey"),
      updateSet = Map("o_totalprice" -> col("src_o_totalprice"),
        "o_orderstatus" -> lit("M")),
      deleteWhen = Some(col("o_orderstatus") === "F"))

    val s = source.select("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice")
    val matchedKept = base.join(s.select("o_orderkey", "o_totalprice")
        .withColumnRenamed("o_totalprice", "np"), Seq("o_orderkey"))
      .filter(col("o_orderstatus") =!= "F")
      .select(col("o_orderkey"), col("o_custkey"), lit("M").as("o_orderstatus"),
        col("np").as("o_totalprice"))
    val unmatchedTarget = base.join(s, Seq("o_orderkey"), "left_anti")
    val inserted = s.join(base, Seq("o_orderkey"), "left_anti")
    assert(sortedRows(st.read("t")) ===
      sortedRows(matchedKept.unionByName(unmatchedTarget).unionByName(inserted)))
  }

  test("copy-on-write is dir-granular: untouched dirs keep their bytes") {
    val st = scratch()
    st.create("t", ord.filter(col("o_orderkey") % 4 === 0))
    st.insert("t", ord.filter(col("o_orderkey") % 4 === 1))
    val before = st.dataDirs("t")
    assert(before.size === 2)
    // source keys live ONLY in the second dir (%4 == 1)
    val source = ord.filter(col("o_orderkey") % 4 === 1 &&
      col("o_orderkey") % 3 === 0)
    st.merge("t", source, Seq("o_orderkey"),
      updateSet = Map("o_totalprice" -> lit(0.0)),
      insertNotMatched = false)
    val after = st.dataDirs("t")
    assert(after.contains(before.head),
      s"first dir ${before.head} must survive a merge that never touched it")
    assert(!after.contains(before(1)), "matched dir must be rewritten")
  }

  test("a multi-match source is refused") {
    val st = scratch()
    st.create("t", ord.filter(col("o_orderkey") % 5 === 0))
    val dup = ord.filter(col("o_orderkey") % 5 === 0).limit(3)
    intercept[IllegalArgumentException] {
      st.merge("t", dup.unionByName(dup), Seq("o_orderkey"))
    }
  }

  test("registered aggregate views stay exact through the facade") {
    val st = scratch()
    st.create("t", ord.filter(col("o_orderkey") % 3 === 0))
    val dfn = MvDef(Seq("o_orderstatus"),
      Seq("__cents" -> "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
    MaterializedView.register(st, "t_mv", "t", dfn)
    val source = ord.filter(col("o_orderkey") % 3 <= 1)
      .withColumn("o_totalprice", col("o_totalprice") + 10.0)
    st.merge("t", source, Seq("o_orderkey"),
      updateSet = Map("o_totalprice" -> col("src_o_totalprice")),
      deleteWhen = Some(col("o_custkey") % 2 === 0))
    assert(sortedRows(st.read("t_mv")) ===
      sortedRows(MaterializedView.aggregate(st.read("t"), dfn.spec)),
      "view diverged from recompute after merge")
  }
}
