package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.store.{AddCol, CastCol, DropCol, RenameCol, TableStore}

/** Schema administration (`Kernel/README.md:275-282`): alters are
  * metadata-only manifest commits applied at read time to pre-op file
  * vintages; `migrate` is the explicit data-moving rewrite. */
class SchemaEvolutionSpec extends SparkSpec {

  private def freshStore(): TableStore =
    new TableStore(spark, Files.createTempDirectory("graft-schema-spec-").toString)

  private def seedDf = {
    import spark.implicits._
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("id", "tag", "v")
  }

  test("addColumn is metadata-only: zero data dirs rewritten") {
    val st = freshStore()
    st.create("t", seedDf)
    val before = st.dataDirs("t")
    st.addColumn("t", "score", "DOUBLE", Some("v * 2.0"))
    assert(st.dataDirs("t") == before,
      "alter must not touch data files — manifest commit only")
    assert(st.pendingOps("t").size == 1)
    val rows = st.read("t").select("id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows == Map(1L -> 20.0, 2L -> 40.0, 3L -> 60.0),
      "backfill expression must evaluate at read for pre-op rows")
  }

  test("vintage semantics: ops apply only to files written before them") {
    import spark.implicits._
    val st = freshStore()
    st.create("t", seedDf)
    st.addColumn("t", "score", "DOUBLE", Some("v * 2.0"))
    // post-op insert provides the column explicitly — including a row
    // where it is genuinely NULL, which the default must NOT overwrite
    st.insert("t", Seq((4L, "d", 40.0, Some(7.0)), (5L, "e", 50.0, None))
      .toDF("id", "tag", "v", "score"))
    val rows = st.read("t").collect()
      .map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(rows(4L) == Some(7.0), "explicit value survives")
    assert(rows(5L).isEmpty, "explicit NULL after the op stays NULL")
    assert(rows(1L) == Some(20.0), "pre-op rows read the default")
  }

  test("rename, drop and cast compose in log order") {
    val st = freshStore()
    st.create("t", seedDf)
    st.renameColumn("t", "v", "value")
    st.dropColumn("t", "tag")
    st.castColumn("t", "id", "INT")
    val df = st.read("t")
    assert(df.columns.toSet == Set("id", "value"))
    assert(df.schema("id").dataType.typeName == "integer")
    assert(df.select(sum("value")).head.getDouble(0) == 60.0)
  }

  test("copy-on-write mutation through pending ops uses the logical schema") {
    import spark.implicits._
    val st = freshStore()
    st.create("t", seedDf)
    st.renameColumn("t", "v", "value")
    st.insert("t", Seq((10L, "x", 1.0)).toDF("id", "tag", "value"))
    val before = st.dataDirs("t")
    assert(before.size == 2)
    // condition on the RENAMED column; only the second dir matches
    st.update("t", Map("value" -> (col("value") * 100.0)), col("id") === 10L)
    assert(st.dataDirs("t").contains(before(0)),
      "untouched pre-op dir carried by reference through the op line")
    val m = st.read("t").collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(m == Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0, 10L -> 100.0))
  }

  test("migrate materializes the logical schema and clears pending ops") {
    val st = freshStore()
    st.create("t", seedDf)
    st.addColumn("t", "score", "DOUBLE", Some("v * 2.0"))
    st.dropColumn("t", "tag")
    val logical = st.read("t").orderBy("id").collect().toSeq
    st.migrate("t")
    assert(st.pendingOps("t").isEmpty, "migrate clears the op log")
    assert(st.dataDirs("t").size == 1, "migrate compacts to one vintage")
    assert(st.read("t").orderBy("id").collect().toSeq == logical,
      "lazy and materialized schemas must be observationally identical")
  }

  test("alters validate against the logical schema at commit time") {
    val st = freshStore()
    st.create("t", seedDf)
    st.renameColumn("t", "v", "value")
    intercept[IllegalArgumentException](st.addColumn("t", "value", "DOUBLE"))
    intercept[IllegalArgumentException](st.dropColumn("t", "nope"))
    intercept[IllegalArgumentException](st.renameColumn("t", "v", "w"))
    intercept[IllegalArgumentException](st.castColumn("t", "v", "INT"))
    assert(st.read("t").columns.toSet == Set("id", "tag", "value"),
      "failed alters must publish nothing")
  }

  test("schema ops on a partition column are rejected (layout-defining)") {
    import spark.implicits._
    val st = freshStore()
    st.createPartitioned("p",
      Seq((1L, 0), (2L, 1)).toDF("id", "bucket"), Seq("bucket"))
    // committing any of these would wedge every later write: writeData
    // repartitions by the stale PartColsEntry name
    intercept[IllegalArgumentException](st.renameColumn("p", "bucket", "b"))
    intercept[IllegalArgumentException](st.dropColumn("p", "bucket"))
    intercept[IllegalArgumentException](st.castColumn("p", "bucket", "BIGINT"))
    st.renameColumn("p", "id", "pk") // non-partition columns still evolve
    st.insert("p", Seq((3L, 0)).toDF("pk", "bucket"))
    assert(st.read("p").count() == 3)
  }

  test("schema ops survive package-instance pointer inheritance") {
    import spark.implicits._
    val st = freshStore()
    st.create("base_t", seedDf)
    st.addColumn("base_t", "score", "DOUBLE", Some("v * 2.0"))
    // link an alias table to base_t's entries (the package-inherit path)
    st.transaction(tx => tx.link("alias_t", st.entriesAsRefs("base_t")))
    val rows = st.read("alias_t").select("id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows == Map(1L -> 20.0, 2L -> 40.0, 3L -> 60.0),
      "op lines must carry through cross-table refs")
  }

  test("vintage-compaction guard bounds scan count under alternating insert/alter") {
    import spark.implicits._
    val st = freshStore()
    st.create("t", seedDf)
    // 30 alternating alter/insert cycles: every op line splits the data
    // dirs into another run, and each run costs one scan per read —
    // unguarded, this manifest would fold 31 parquet reads + 30 unions
    (1 to 30).foreach { i =>
      st.castColumn("t", "v", "DOUBLE") // metadata-only op line
      st.insert("t", Seq((100L + i, s"n$i", i.toDouble)).toDF("id", "tag", "v"))
    }
    val maxRuns = graft.store.Txn.DefaultMaxVintageRuns
    val df = st.read("t")
    val scans = df.queryExecution.optimizedPlan.collectLeaves().size
    assert(scans <= maxRuns + 1,
      s"read plan must stay bounded at ~$maxRuns scans, got $scans")
    assert(st.pendingOps("t").size <= maxRuns,
      "compaction folds old op lines away")
    assert(df.count() == 33, "compaction must lose no rows")
    assert(df.columns.toSeq == Seq("id", "tag", "v"))
    assert(df.filter(col("id") === 115L).head.getDouble(2) == 15.0)
  }

  test("atomic multi-op alter with backfill referencing other columns") {
    val st = freshStore()
    st.create("t", seedDf)
    st.alterTable("t",
      AddCol("label", "STRING", Some("concat(tag, '-', CAST(id AS STRING))")),
      RenameCol("v", "value"),
      DropCol("tag"),
      CastCol("id", "BIGINT"))
    val r = st.read("t").filter(col("id") === 2L).head
    assert(r.getAs[String]("label") == "b-2")
    assert(st.read("t").columns.toSet == Set("id", "value", "label"))
    assert(st.versionCount("t") == 2, "one manifest commit for all four ops")
  }
}
