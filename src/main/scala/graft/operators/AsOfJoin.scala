package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — an operator Spark's built-ins lack (the builder brief's
  * canonical example). For every left row, attach the value of the most
  * recent right row with `rightTs <= leftTs` for the same key.
  *
  * Implementation is composition (preference order (a) of the custom-
  * operator ladder): union the tagged sides and take `last(value) IGNORE
  * NULLS` over a per-key window RANGE-framed to the current timestamp —
  * ONE shuffle on the key and a single sort, instead of the naïve
  * per-row lookup join. The RANGE frame (not ROWS) makes timestamp ties
  * behave like DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`.
  *
  * Scale: cost is one repartition-by-key + per-partition sort — the
  * same shape as any windowed aggregation; no broadcast, no O(n·m)
  * pair enumeration, skew handled by AQE like any other window.
  */
object AsOfJoin {

  /** left/right must share `keyCol` and `tsCol`; the right side
    * contributes `valueCol`, emitted as `asof_<valueCol>`.
    *
    * Duplicate right rows on the same (key, ts) are collapsed to
    * `max(value)` BEFORE the union: `last(__rv)` over a RANGE frame picks
    * an arbitrary peer (intra-peer order is unspecified), so without the
    * pre-aggregation results would be nondeterministic run-to-run. */
  def asOf(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, valueCol: String): DataFrame = {
    val l = left.withColumn("__side", lit("L"))
      .withColumn("__rv", lit(null).cast(right.schema(valueCol).dataType))
    val r = right.groupBy(col(keyCol), col(tsCol))
      .agg(max(col(valueCol)).as("__rv"))
      .withColumn("__side", lit("R"))
    val leftCols = left.columns
    val unioned = l.select(
      (leftCols.map(col) :+ col("__side") :+ col("__rv")): _*)
      .unionByName(r.select(
        (leftCols.map(c => if (c == keyCol || c == tsCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c))
          :+ col("__side") :+ col("__rv")): _*))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(s"asof_$valueCol", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === "L")
      .drop("__side", "__rv")
  }

  /** Generalized as-of: either direction, optional tolerance, and the
    * matched right timestamp emitted alongside the value (`asof_ts` +
    * `asof_<valueCol>`; both null when no match, or when the nearest
    * match falls outside `tolerance`).
    *
    * - `forward = false` (default): latest right row with
    *   `rightTs <= leftTs` — [[asOf]]'s direction.
    * - `forward = true`: EARLIEST right row with `rightTs >= leftTs`
    *   (the "next reading after" lookup) — same one-shuffle window
    *   plan, sorted descending so the incremental frame applies.
    * - `tolerance`: an upper bound on `|leftTs - matchedTs|` (an
    *   INTERVAL column for timestamps); the nearest match is found
    *   first, then nulled if it is too far — DuckDB/pandas
    *   `merge_asof(tolerance=...)` semantics, NOT "nearest within
    *   window" (a closer-but-wrong-side row never substitutes).
    *
    * The matched (ts, value) travel as ONE struct, so both outputs
    * come from the same right row even if its value is null — row
    * semantics, matching SQL ASOF JOIN (unlike [[asOf]], whose bare
    * `last(value) IGNORE NULLS` skips null-valued rows).
    *
    * Scale: identical shape to [[asOf]] — one hash exchange on the key
    * and one per-partition sort; direction and tolerance change only
    * the window frame and a post-filter, never the shuffle. */
  def asOfMatch(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, valueCol: String,
      forward: Boolean = false, tolerance: Option[Column] = None): DataFrame = {
    // a null-ts right row can never be a valid match (it would sort to
    // a frame edge and become a phantom pick); null-ts LEFT rows are
    // defined unmatched via the `ok` guard below
    val r = right.filter(col(tsCol).isNotNull)
      .groupBy(col(keyCol), col(tsCol))
      .agg(max(col(valueCol)).as("__rv"))
      .withColumn("__side", lit("R"))
    val l = left.withColumn("__side", lit("L"))
    val leftCols = left.columns
    val matchStruct = struct(col(tsCol).as("ts"), col("__rv").as("v"))
    val lU = l.select(leftCols.map(col) :+ col("__side") :+
      lit(null).cast(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("ts", left.schema(tsCol).dataType),
        org.apache.spark.sql.types.StructField("v", right.schema(valueCol).dataType))))
        .as("__m"): _*)
    val rU = r.select(leftCols.map(c =>
      if (c == keyCol || c == tsCol) col(c)
      else lit(null).cast(left.schema(c).dataType).as(c))
      :+ col("__side") :+ matchStruct.as("__m"): _*)
    // BOTH directions use the incremental (unboundedPreceding,
    // currentRow) RANGE frame — forward simply sorts DESCENDING, so
    // "rows at or after me" are the frame's preceding rows. The naive
    // (currentRow, unboundedFollowing) frame looks equivalent but Spark
    // evaluates it with UnboundedFollowingWindowFunctionFrame, which
    // recomputes the aggregate from each frame start to the partition
    // end — O(n²) per key; this form keeps the running-frame O(n) pass
    // in either direction.
    val order = if (forward) col(tsCol).desc else col(tsCol).asc
    val w = Window.partitionBy(col(keyCol)).orderBy(order)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val pick = (c: Column) => last(c, ignoreNulls = true)
    val gap = if (forward) col("__pick.ts") - col(tsCol)
      else col(tsCol) - col("__pick.ts")
    val matched = col("__pick").isNotNull && col(tsCol).isNotNull
    val ok = tolerance match {
      case Some(tol) => matched && gap <= tol
      case None => matched
    }
    lU.unionByName(rU)
      .withColumn("__pick", pick(col("__m")).over(w))
      .filter(col("__side") === "L")
      .withColumn("asof_ts", when(ok, col("__pick.ts")))
      .withColumn(s"asof_$valueCol", when(ok, col("__pick.v")))
      .drop("__side", "__m", "__pick")
  }
}
