package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyless 2-D box join by grid-cell banding — [[BandedRangeJoin]]'s
  * construction lifted to two dimensions (the classic ε-grid spatial
  * join: Patel & DeWitt 1996 "Partition Based Spatial-Merge Join"; the
  * same shape PostGIS and Sedona execute): without an equi-key,
  * `|x−x'| < ε AND |y−y'| < ε` can only plan as a nested loop over
  * every pair. Quantizing both coordinates into ε-cells, each build
  * point lands in exactly ONE cell and each probe point explodes to its
  * 3×3 neighborhood; a true pair's cell coordinates differ by at most
  * one in each axis (|Δx| < ε bounds the floor difference), so every
  * pair meets in exactly the build point's cell — found once, no dedup.
  *
  * Scale shape: one shuffle per side on the (cx, cy) integer cell key;
  * pair work is bounded by cell occupancy (spatial density), not corpus
  * size. Cell ids come from `floor(coord / ε)` on the same doubles in
  * both engines — identical IEEE division and floor, so the plan audit
  * and the exact-predicate re-check are belt and braces, not a
  * correctness dependency.
  */
object GridSpatialJoin {

  /** All pairs of `points` rows within an open ε-box of each other,
    * emitted once with `a < b` (self-join form). `points` columns:
    * `idCol` (integral), `xCol`/`yCol` (double). */
  def selfBoxJoin(points: DataFrame, idCol: String, xCol: String,
      yCol: String, eps: Double): DataFrame = {
    require(eps > 0, s"eps must be positive: $eps")
    val build = points.select(col(idCol).as("b"),
      col(xCol).as("x2"), col(yCol).as("y2"))
      .withColumn("cx", expr(s"CAST(floor(x2 / $eps) AS BIGINT)"))
      .withColumn("cy", expr(s"CAST(floor(y2 / $eps) AS BIGINT)"))
    val cells = (for { dx <- -1 to 1; dy <- -1 to 1 }
      yield s"struct(cx + ${dx}L AS cx, cy + ${dy}L AS cy)").mkString(", ")
    val probe = points.select(col(idCol).as("a"),
      col(xCol).as("x"), col(yCol).as("y"))
      .withColumn("cx", expr(s"CAST(floor(x / $eps) AS BIGINT)"))
      .withColumn("cy", expr(s"CAST(floor(y / $eps) AS BIGINT)"))
      .withColumn("__c", explode(expr(s"array($cells)")))
      .select(col("a"), col("x"), col("y"),
        col("__c.cx").as("cx"), col("__c.cy").as("cy"))
    probe.join(build, Seq("cx", "cy"))
      .filter(col("a") < col("b") &&
        expr(s"abs(x - x2) < $eps AND abs(y - y2) < $eps"))
      .select("a", "b")
  }
}
