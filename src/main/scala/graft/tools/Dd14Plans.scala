package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.operators.{MinHashLSH, TextFns}

/** dd14c's expensive subplans live BEHIND localCheckpoint stage
  * boundaries, so the top-level explain shows ExistingRDD scans where
  * the work happens. This dumps the inner md5-sig and verify stages
  * before/after the r20 optimization so the plan evidence is reviewable
  * (plans/r20/dd14c_sigs_*.txt, dd14c_verify_*.txt). The "before"
  * variants are reconstructed from the same public helpers the old code
  * composed (TextFns.shinglesSql + MinHashLSH.md5Hash31Sql; join-verify
  * with the unbounded intersect), so the comparison is code-faithful. */
object Dd14Plans {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("plans/r20")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      Files.write(Paths.get(outDir, s"$name.txt"),
        df.queryExecution.explainString(ExplainMode.fromString("formatted"))
          .getBytes("UTF-8"))
      println(s"WROTE $outDir/$name.txt")
    }
    val (as, bs) = MinHashLSH.coeffs(63)
    graft.functions.VectorFns.register(spark, as, bs)
    val docs = t(spark, d, "documents").select(col("doc_id"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism)

    // --- sig stage: composed md5-hex chain (before) vs native (after)
    val sigsBefore = docs
      .withColumn("h", sort_array(array_distinct(expr(
        s"transform(${TextFns.shinglesSql("text", 5)}," +
          s" x -> ${MinHashLSH.md5Hash31Sql("x")})"))))
      .filter(size(col("h")) > 0)
      .withColumn("_mh", expr("graft_minhash_sig_long(h)"))
      .select(col("doc_id"), col("h"), col("_mh"))
    dump("dd14c_sigs_before", sigsBefore)
    val sigsAfter = docs
      .withColumn("h", expr("graft_shingle_hashes_md5(text, 5)"))
      .filter(size(col("h")) > 0)
      .withColumn("_mh", expr("graft_minhash_sig_long(h)"))
      .select(col("doc_id"), col("h"), col("_mh"))
    dump("dd14c_sigs_after", sigsAfter)

    // --- verify stage: pre-distinct + two shuffle joins + unbounded
    // intersect (before) vs raw-stream broadcast map-verify (after).
    // The after plan is the real production builder's, captured by
    // explaining nearDuplicatesMd5's output frame directly.
    val sigs = sigsAfter.localCheckpoint()
    def banded(idAs: String) = sigs.select(col("doc_id").as(idAs), explode(expr(
      """transform(sequence(0, 20),
            bi -> struct(bi AS band,
              array_join(transform(slice(_mh, bi * 3 + 1, 3),
                x -> CAST(x AS STRING)), ':') AS sig))""")).as("b"))
      .select(col(idAs), col("b.band"), col("b.sig"))
    val sa = sigs.select(col("doc_id").as("a_id"), col("h").as("sa"))
    val sb = sigs.select(col("doc_id").as("b_id"), col("h").as("sb"))
    val verifyBefore = banded("a_id")
      .join(banded("b_id"), Seq("band", "sig"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .dropDuplicates("a_id", "b_id")
      .join(sa, "a_id").join(sb, "b_id")
      .withColumn("inter", expr("graft_sorted_intersect_long(sa, sb)"))
      .withColumn("jaccard",
        TextFns.jaccardFromIntersect("inter", "size(sa)", "size(sb)"))
      .filter(col("jaccard") >= 0.25)
      .select("a_id", "b_id", "jaccard")
    dump("dd14c_verify_before", verifyBefore)
    // r20 form (the r21 "before"): raw-stream broadcast map probed via
    // a Dataset mapPartitions — the DeserializeToObject /
    // SerializeFromObject encoder boundary the r21 expression removes
    locally {
      import spark.implicits._
      val bmap = spark.sparkContext.broadcast(
        sigs.select(col("doc_id"), col("h"))
          .as[(Long, Array[Long])].collect().toMap)
      val mapVerify = banded("a_id")
        .join(banded("b_id"), Seq("band", "sig"))
        .filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"))
        .as[(Long, Long)]
        .mapPartitions { it =>
          val m = bmap.value
          it.flatMap { case (a, b) =>
            val sa = m(a); val sb = m(b)
            val c = sa.intersect(sb).length // plan-shape dump only
            val jac = c.toDouble / (sa.length + sb.length - c)
            if (jac >= 0.25) Some((a, b, jac)) else None
          }
        }.toDF("a_id", "b_id", "jaccard")
        .dropDuplicates("a_id", "b_id")
      dump("dd14c_verify_mapverify_r20", mapVerify)
      bmap.destroy()
    }
    // r21 form: the codegen'd broadcast-probe expression over the raw
    // candidate stream — dumped PRE-checkpoint (the production
    // probeVerify materializes eagerly so it can destroy its
    // broadcast, which would hide this plan behind an ExistingRDD)
    locally {
      import spark.implicits._
      val bc = spark.sparkContext.broadcast(
        graft.functions.VectorFns.IdHashesMap.build(
          sigs.select(col("doc_id"), col("h"))
            .as[(Long, Array[Long])].collect()))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_bjac_dump",
        exprs => graft.functions.VectorFns.BroadcastJaccardProbe(
          exprs(0), exprs(1), bc, 0.25), "built-in")
      val probeVerify = banded("a_id")
        .join(banded("b_id"), Seq("band", "sig"))
        .filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"))
        .withColumn("jaccard", expr("graft_bjac_dump(a_id, b_id)"))
        .filter(col("jaccard") >= 0.25)
        .dropDuplicates("a_id", "b_id")
        .select("a_id", "b_id", "jaccard")
      dump("dd14c_verify_after", probeVerify)
      bc.destroy()
    }
    spark.stop()
  }
}
