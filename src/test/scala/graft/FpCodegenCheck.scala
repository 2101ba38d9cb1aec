package graft
import org.apache.spark.sql.functions._
import graft.operators.TextFns

/** Asserts Fingerprint64 runs INSIDE whole-stage codegen: the generated
  * code for the stage must contain the fp64 static call, and executing
  * it must produce the golden value (codegen failure would fall back
  * silently with a WARN — this pins the fast path, not just the result). */
class FpCodegenCheck extends SparkSpec {
  test("Fingerprint64 is codegen'd into the stage, not a fallback") {
    // a parquet-backed scan: a local Seq would be constant-folded into
    // a LocalTableScan with the fingerprint evaluated at plan time
    val df = graft.Tables.t(spark, sf, "documents")
      .select(TextFns.fingerprintOf(col("text")).as("fp"))
    val plan = df.queryExecution.executedPlan
    val wsc = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.nonEmpty, s"no WholeStageCodegen in:\n$plan")
    val srcs = wsc.map(_.doCodeGen()._2.body)
    assert(srcs.exists(_.contains("graft.functions.VectorFns.fp64")),
      "generated stage does not inline the fingerprint call")
    // and the generated stage actually executes (a codegen compile
    // error would silently fall back): cross-check one golden value
    import spark.implicits._
    val one = Seq("emoji 😀 pair").toDF("text")
    assert(df.count() > 0)
    assert(one.select(TextFns.fingerprintOf(col("text"))).head.getLong(0)
      == 163956695839649769L)
  }

  test("PQ encode + ADC score are codegen'd into their stages, not fallbacks") {
    graft.functions.VectorFns.register(spark)
    val cents: Seq[Seq[Seq[Double]]] =
      (0 until 8).map(j => (0 until 4).map(c =>
        (0 until 8).map(d => (j + c + d) / 10.0)))
    val enc = graft.Tables.t(spark, sf, "embeddings")
      .withColumn("__cents", typedLit(cents))
      .select(expr("graft_pq_encode(embedding, __cents)").as("codes"))
    val encPlan = enc.queryExecution.executedPlan
    val encSrc = encPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.map(_.doCodeGen()._2.body)
    assert(encSrc.exists(_.contains("graft.functions.VectorFns.pqEncode")),
      s"pqEncode not inlined:\n$encPlan")
    assert(enc.head.getSeq[Int](0).length == 8)
    val adc = enc
      .withColumn("lut", typedLit((0 until 8).map(j =>
        (0 until 4).map(c => (j * 4 + c) / 10.0))))
      .select(expr("graft_pq_adc(lut, codes)").as("s"))
    val adcSrc = adc.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.map(_.doCodeGen()._2.body)
    assert(adcSrc.exists(_.contains("graft.functions.VectorFns.pqAdc")),
      "pqAdc not inlined")
    assert(!adc.head.isNullAt(0))
  }
}
