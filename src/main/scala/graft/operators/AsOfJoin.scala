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
}
