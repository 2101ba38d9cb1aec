package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import graft.store.TableStore

/** Store-level hash partitioning (`TableStore.createPartitioned`) — the
  * mechanism behind the streaming-dedup probe's bucket pruning: a probe
  * filtering on the partition column must OPEN fewer files than the
  * corpus holds, not post-filter a full scan (the round-8 "per-batch
  * full corpus scan" gap, DocStreams.scala's 100 TB story). */
class StoreBucketPruningSpec extends SparkSpec {

  private def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
    case s: QueryStageExec => allScans(s.plan)
    case f: FileSourceScanExec => Seq(f)
    case other => other.children.flatMap(allScans)
  }

  /** Execute `df` and return (files the scan opened, rows). Collects
    * through df's OWN queryExecution — `count()` would build a separate
    * plan and leave these scans' metrics untouched. */
  private def filesRead(df: DataFrame): (Long, Long) = {
    val rows = df.collect().length.toLong
    val scans = allScans(df.queryExecution.executedPlan)
    assert(scans.nonEmpty, s"no file scan in:\n${df.queryExecution.executedPlan}")
    (scans.map(_.metrics("numFiles").value).sum, rows)
  }

  private def parquetFilesOnDisk(root: String, table: String): Long = {
    val dir = java.nio.file.Paths.get(root, table)
    val s = Files.walk(dir)
    try s.filter(p => p.getFileName.toString.endsWith(".parquet")).count()
    finally s.close()
  }

  private def mkCorpus(n: Long) = {
    val buckets = 8L
    (from: Long, to: Long) =>
      spark.range(from, to).select(
        col("id").as("fp"),
        pmod(col("id"), lit(buckets)).cast("int").as("fp_bucket"))
  }

  test("bucket probe opens fewer files than the corpus holds, across inserts") {
    val root = Files.createTempDirectory("graft-bucketprune-").toString
    val store = new TableStore(spark, root)
    val slice = mkCorpus(800)
    store.createPartitioned("corpus", slice(0, 400).repartition(2), Seq("fp_bucket"))
    store.insert("corpus", slice(400, 800).repartition(2)) // second data dir
    assert(store.partitionColumns("corpus") == Seq("fp_bucket"))

    val pruned = store.read("corpus")
      .filter(col("fp_bucket").isin(1, 3)).select("fp")
    val (nFiles, nRows) = filesRead(pruned)
    val total = parquetFilesOnDisk(root, "corpus")
    assert(nRows == 200, s"2 of 8 buckets over 800 rows should be 200, got $nRows")
    assert(nFiles > 0 && nFiles < total,
      s"probe must open a strict subset of files: read $nFiles of $total")
    // and the right rows — pruning must not drop data
    val got = pruned.collect().map(_.getLong(0)).toSet
    assert(got == (0L until 800L).filter(i => i % 8 == 1 || i % 8 == 3).toSet)
  }

  test("truncate of a partitioned table stays readable and re-insertable") {
    val root = Files.createTempDirectory("graft-buckettrunc-").toString
    val store = new TableStore(spark, root)
    val slice = mkCorpus(800)
    store.createPartitioned("corpus", slice(0, 400), Seq("fp_bucket"))
    store.truncate("corpus")
    // an empty partitioned write leaves no col=value dirs — the marker
    // file must still give readers a schema
    assert(store.read("corpus").count() == 0)
    assert(store.read("corpus").columns.contains("fp_bucket"))
    store.insert("corpus", slice(400, 800))
    assert(store.read("corpus").count() == 400)
    assert(store.partitionColumns("corpus") == Seq("fp_bucket"),
      "partition property must survive truncate")
    val (nFiles, nRows) = filesRead(
      store.read("corpus").filter(col("fp_bucket") === 2).select("fp"))
    assert(nRows == 50)
    assert(nFiles < parquetFilesOnDisk(root, "corpus"),
      "re-inserted table no longer prunes")
  }

  test("vacuum reclaims stranded partitioned dirs, nested bucket files included") {
    val root = Files.createTempDirectory("graft-bucketvac-").toString
    val store = new TableStore(spark, root)
    spark.conf.set(TableStore.VacuumGraceMsConf, "0")
    try {
      val slice = mkCorpus(800)
      store.createPartitioned("corpus", slice(0, 400), Seq("fp_bucket"))
      // COW delete strands the original partitioned dir
      store.delete("corpus", col("fp") < 100L)
      val before = store.dataDirsOnDisk("corpus").size
      val stats = store.vacuum(retainVersions = 1)
      assert(stats.dataDirsDeleted >= 1,
        s"expected the pre-delete dir reclaimed, stats=$stats")
      assert(store.dataDirsOnDisk("corpus").size < before)
      // the surviving table still reads, prunes, and holds the right rows
      val left = store.read("corpus")
      assert(left.count() == 300)
      val (nFiles, _) = filesRead(left.filter(col("fp_bucket") === 3).select("fp"))
      assert(nFiles < parquetFilesOnDisk(root, "corpus"))
    } finally spark.conf.unset(TableStore.VacuumGraceMsConf)
  }

  test("export of a bucketed table keeps the hive-partitioned layout") {
    val root = Files.createTempDirectory("graft-bucketexp-").toString
    val store = new TableStore(spark, root)
    store.createPartitioned("corpus", mkCorpus(800)(0, 400), Seq("fp_bucket"))
    val dest = Files.createTempDirectory("graft-bucketexp-out-").toString
    store.exportTable("corpus", dest)
    // the snapshot is standard hive-partitioned parquet: col=value dirs
    val kids = {
      val s = Files.list(java.nio.file.Paths.get(dest))
      try {
        val it = s.iterator(); val b = Seq.newBuilder[String]
        while (it.hasNext) b += it.next().getFileName.toString
        b.result()
      } finally s.close()
    }
    assert(kids.count(_.startsWith("fp_bucket=")) == 8, s"layout: $kids")
    // readable by any engine with identical content
    val back = spark.read.parquet(dest)
    assert(back.count() == 400)
    assert(back.columns.toSet == Set("fp", "fp_bucket"))
  }

  test("inserts and COW rewrites keep the partition layout") {
    val root = Files.createTempDirectory("graft-bucketcow-").toString
    val store = new TableStore(spark, root)
    val slice = mkCorpus(800)
    store.createPartitioned("corpus", slice(0, 400), Seq("fp_bucket"))
    store.insert("corpus", slice(400, 800))
    // every data dir must hold fp_bucket= subdirectories
    store.dataDirsOnDisk("corpus").foreach { d =>
      val sub = java.nio.file.Paths.get(root, "corpus", d)
      val kids = {
        val s = Files.list(sub)
        try {
          val it = s.iterator(); val b = Seq.newBuilder[String]
          while (it.hasNext) b += it.next().getFileName.toString
          b.result()
        } finally s.close()
      }
      assert(kids.exists(_.startsWith("fp_bucket=")),
        s"data dir $d written unpartitioned: $kids")
    }
    // file-level COW delete: the touched-dir probe must recognize data
    // dirs through the partition subdir in the file path
    store.delete("corpus", col("fp") === 5L)
    val after = store.read("corpus")
    assert(after.count() == 799)
    assert(after.filter(col("fp") === 5L).isEmpty)
    // the rewritten dir is still partitioned
    val pruned = store.read("corpus").filter(col("fp_bucket") === 5)
    val (nFiles, _) = filesRead(pruned)
    assert(nFiles < parquetFilesOnDisk(root, "corpus"),
      "rewritten table no longer prunes")
  }
}
