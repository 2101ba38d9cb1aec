package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `mightContainLong` over a DRIVER-MAINTAINED bloom filter as a
  * codegen'd Catalyst expression — the streaming dedup pre-split's
  * probe (`streaming/DocStreams.scala`).
  *
  * Why not Spark's own `BloomFilterMightContain`: that expression takes
  * the SERIALIZED filter as a child (literal or scalar subquery), and a
  * multi-MB binary literal is rendered IN FULL by every plan
  * stringification — AQE's onUpdatePlan explainString alone OOMed a 4 GB
  * test JVM on a 5 MB filter (hex-rendered per plan copy, per batch).
  * Here the filter rides a [[Broadcast]] handle instead: the plan
  * carries ~nothing (toString prints the class name), executors fetch
  * the filter once per JVM through broadcast machinery (the right
  * distribution primitive for multi-MB read-only state at 1000
  * executors — a plan literal would re-ship with every task binary),
  * and the probe itself is the same single `mightContainLong` call,
  * codegen'd, so the batch plan stays inside whole-stage codegen.
  *
  * The caller owns the broadcast lifecycle (create per batch, destroy
  * once the commit is durable — DocStreams' discipline). */
case class BloomMightContainLong(bc: Broadcast[BloomFilter],
    child: Expression) extends UnaryExpression {

  override def dataType: DataType = BooleanType

  // reject a non-LONG child at ANALYSIS (a readable error naming the
  // offending type) instead of a runtime ClassCastException in
  // nullSafeEval / a codegen compile failure (AbstractDataType is
  // private[sql], so checkInputDataTypes is the extension point here)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_contain expects a BIGINT probe value, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    bc.value.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bc,
      classOf[Broadcast[BloomFilter]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = ((org.apache.spark.util.sketch.BloomFilter)
         |  $bcRef.value()).mightContainLong($c);""".stripMargin)
  }

  // the probe's identity in plan strings — NEVER the filter bytes
  override def toString: String = s"graft_bloom_might_contain($child)"
  override def sql: String = s"graft_bloom_might_contain(${child.sql})"

  override protected def withNewChildInternal(newChild: Expression)
      : BloomMightContainLong = copy(child = newChild)
}
