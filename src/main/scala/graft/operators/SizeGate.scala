package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-gated broadcast hints.
  *
  * An unconditional `broadcast(df)` is a plan-time promise that `df` fits
  * in every executor — right at sf0.1, fatal at 100 TB (a forced broadcast
  * larger than executor memory OOMs; Spark won't save you from your own
  * hint). Every operator that wants a broadcast for locality must gate the
  * hint on the actual row count and fall back to a plain equi-join, which
  * Catalyst executes co-located (shuffle both sides on the join key) and
  * AQE may still upgrade back to broadcast from RUNTIME stats — the safe
  * direction.
  */
object SizeGate {

  /** Session override for every gate's row cap. Tests force the shuffle
    * path with 0; clusters with fat executors can raise it. */
  val MaxRowsConf = "spark.graft.broadcast.maxRows"

  /** Hint `df` for broadcast only when `rows` (a measured count, not a
    * guess) is within the cap. `defaultMaxRows` is the call site's cap,
    * chosen from its per-row payload size; [[MaxRowsConf]] overrides. */
  def maybeBroadcast(df: DataFrame, rows: Long, defaultMaxRows: Long): DataFrame =
    if (rows <= rowCap(df.sparkSession, defaultMaxRows)) broadcast(df) else df

  /** The effective row cap at a call site — its default unless the
    * session override is set. Shared by the hint above and operators
    * that gate non-join broadcast strategies on the same knob. */
  def rowCap(spark: org.apache.spark.sql.SparkSession,
      defaultMaxRows: Long): Long =
    spark.conf.getOption(MaxRowsConf).map(_.toLong).getOrElse(defaultMaxRows)
}
