package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyless interval join by time-banding — the range-join shape Spark's
  * built-ins handle worst. With an equi-key, a range predicate rides the
  * key join (j10's shape); WITHOUT one, Catalyst's only plan for
  * `b.ts BETWEEN a.lo AND a.hi` is a broadcast-nested-loop or cartesian
  * product — O(n·m) pair enumeration that no cluster size survives.
  *
  * The fix is the standard binning rewrite (the range-join optimization
  * Databricks documents for Delta, and the interval-join strategy Flink
  * executes natively): quantize time into fixed-width bands no narrower
  * than the query window, map each build row to its ONE band and each
  * probe interval to the ≤2 DISTINCT bands it can overlap, equi-join on
  * the band id, and re-apply the exact range predicate. Every true pair
  * shares the band the build row lands in (window ≤ band width bounds
  * the probe interval to two consecutive bands), and no pair is emitted
  * twice because the probe's band list is distinct while the build row
  * has exactly one band — correctness needs no dedup pass.
  *
  * Scale shape: ONE shuffle each side on an 8-byte integer band id; the
  * per-band pair work is bounded by band occupancy (time-local density),
  * not corpus size — the plan audit pins the absence of
  * CartesianProduct/BroadcastNestedLoopJoin. Band arithmetic runs on
  * exact BIGINT nanos (the repo's events-time convention), never
  * doubles.
  */
object BandedRangeJoin {

  /** Join `probe` intervals `[startNs, startNs + windowNanos)` to
    * `build` rows whose `tsNs` falls inside, with NO equi-key.
    * `startNsCol`/`tsNsCol` are BIGINT epoch-nano columns;
    * `bandNanos` defaults to the window width (the minimal band that
    * keeps the probe side at ≤2 bands per interval). Returns
    * probe columns + build columns for each matching pair. */
  def bandJoin(probe: DataFrame, build: DataFrame,
      startNsCol: String, tsNsCol: String, windowNanos: Long,
      bandNanos: Long = 0L): DataFrame = {
    val band = if (bandNanos > 0) bandNanos else windowNanos
    require(band >= windowNanos,
      s"band width $band must cover the window $windowNanos — a narrower " +
        "band would need more than two probe bands per interval")
    val p = probe.withColumn("__bands", array_distinct(array(
      expr(s"`$startNsCol` div ${band}L"),
      expr(s"(`$startNsCol` + ${windowNanos - 1}L) div ${band}L"))))
      .withColumn("__band", explode(col("__bands")))
      .drop("__bands")
    val b = build.withColumn("__band", expr(s"`$tsNsCol` div ${band}L"))
    p.join(b, Seq("__band"))
      .filter(col(tsNsCol) >= col(startNsCol) &&
        col(tsNsCol) < col(startNsCol) + lit(windowNanos))
      .drop("__band")
  }
}
