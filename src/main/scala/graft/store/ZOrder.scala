package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for store tables — the
  * multi-dimensional answer to the store's single-key hash partitioning
  * (`createPartitioned`, the reference's `Hash(col)` index port,
  * `Kernel/README.md:62-74`): interleaving the bits of two quantized
  * key columns places rows that are close in BOTH dimensions into the
  * same partition directory, so a 2-D range query — and, crucially, a
  * range on EITHER single dimension — prunes to the few buckets whose
  * cells intersect the query box. A layout partitioned on x alone
  * answers y-ranges with a full scan; the z-layout never does. This is
  * the published OPTIMIZE ZORDER design of Delta/Iceberg table formats
  * (Morton 1966; the space-filling-curve clustering literature),
  * re-expressed on the store's manifest + hive-partitioned directories.
  *
  * Scale shape: the z-value is one codegen'd integer expression per row
  * (map-only; no shuffle beyond the partitioned write itself), the
  * bucket count is fixed at creation (2^(2·bits) directories), and the
  * probe-side bucket enumeration is a driver-side loop over that fixed
  * count — never over data. Quantization bounds are computed once at
  * creation (one aggregate) and PINNED in table props (the st6
  * creation-pinned-modulus precedent): a reader computing cells from
  * fresher data bounds would prune buckets the writer filled.
  *
  * Correctness never depends on the pruning: quantization is monotonic
  * and clamped at both ends, so the kept-bucket set is conservative by
  * construction, and the exact predicate re-applies after the pruned
  * read (ZOrderSpec pins parity against the unpruned filter plus
  * files-read < files-on-disk for 2-D, x-only, and y-only probes).
  */
object ZOrder {

  /** Morton interleave of two `bits`-bit cells as one codegen-friendly
    * integer expression: x occupies even bit positions, y odd. */
  private def interleaveSql(xq: String, yq: String, bits: Int): String =
    (0 until bits).map { i =>
      s"(shiftleft(shiftright($xq, $i) & 1, ${2 * i}) + " +
        s"shiftleft(shiftright($yq, $i) & 1, ${2 * i + 1}))"
    }.mkString("(", " + ", ")")

  /** Quantize a BIGINT value into [0, 2^bits): linear in the pinned
    * [min, min+span) domain, integer arithmetic only, clamped — values
    * outside the creation-time domain land in the edge cells, which is
    * what keeps later probes conservative. */
  private def cellSql(v: String, mn: Long, span: Long, bits: Int): String = {
    val cells = 1L << bits
    s"least(${cells - 1}L, greatest(0L, (($v - ${mn}L) * ${cells}L) div ${span}L))"
  }

  private def cellOf(v: Long, mn: Long, span: Long, bits: Int): Long = {
    val cells = 1L << bits
    // clamp into the domain BEFORE the multiply: a far-out-of-domain
    // probe bound (±2^60) would overflow (v - mn) * cells and wrap to a
    // wrong cell — clamped, the product is bounded by span * cells
    if (v <= mn) 0L
    else if (v >= mn + span - 1) cells - 1
    else ((v - mn) * cells) / span
  }

  /** Create `table` z-ordered on two integer-valued columns: one
    * bounds aggregate, one map-only z-bucket expression, one
    * partitioned write. Bounds, bits, and column names are pinned in
    * table props — the layout parameters the data bakes in. */
  def createZOrdered(store: TableStore, table: String, df: DataFrame,
      xCol: String, yCol: String, bits: Int): Unit = {
    require(bits >= 1 && bits <= 8, s"bits out of range: $bits")
    val b = df.agg(min(col(xCol)).cast("long"), max(col(xCol)).cast("long"),
      min(col(yCol)).cast("long"), max(col(yCol)).cast("long")).head
    require(!b.isNullAt(0) && !b.isNullAt(2),
      s"z-order bounds need non-null $xCol/$yCol")
    val (xMin, xSpan) = (b.getLong(0), math.max(1L, b.getLong(1) - b.getLong(0) + 1))
    val (yMin, ySpan) = (b.getLong(2), math.max(1L, b.getLong(3) - b.getLong(2) + 1))
    val z = interleaveSql(cellSql(s"`$xCol`", xMin, xSpan, bits),
      cellSql(s"`$yCol`", yMin, ySpan, bits), bits)
    store.createPartitioned(table, df.withColumn("zbucket", expr(z)),
      Seq("zbucket"), Map(
        "z_bits" -> bits.toString, "z_x_col" -> xCol, "z_y_col" -> yCol,
        "z_x_min" -> xMin.toString, "z_x_span" -> xSpan.toString,
        "z_y_min" -> yMin.toString, "z_y_span" -> ySpan.toString))
  }

  /** The bucket ids whose (x-cell, y-cell) intersect the query box —
    * a driver-side loop over the FIXED bucket count (≤ 2^16), data
    * never touched. Missing bounds (`None`) leave that dimension
    * unconstrained: an x-only or y-only range still prunes via its own
    * dimension's cells — the z-layout's whole advantage. */
  private[graft] def keptBuckets(props: Map[String, String],
      xRange: Option[(Long, Long)], yRange: Option[(Long, Long)]): Seq[Int] = {
    val bits = props("z_bits").toInt
    def cells(r: Option[(Long, Long)], mn: Long, span: Long): (Long, Long) =
      r.map { case (lo, hi) =>
        (cellOf(lo, mn, span, bits), cellOf(hi, mn, span, bits))
      }.getOrElse((0L, (1L << bits) - 1))
    val (xc0, xc1) = cells(xRange, props("z_x_min").toLong, props("z_x_span").toLong)
    val (yc0, yc1) = cells(yRange, props("z_y_min").toLong, props("z_y_span").toLong)
    (0 until (1 << (2 * bits))).filter { zb =>
      var (cx, cy, i) = (0L, 0L, 0)
      while (i < bits) {
        cx |= ((zb >> (2 * i)) & 1).toLong << i
        cy |= ((zb >> (2 * i + 1)) & 1).toLong << i
        i += 1
      }
      cx >= xc0 && cx <= xc1 && cy >= yc0 && cy <= yc1
    }
  }

  /** Range query over a z-ordered table: partition-pruned read (the
    * zbucket IN-filter prunes directories statically, the ann6/st6
    * contract) + the exact predicate on top, `zbucket` dropped. */
  def rangeQuery(store: TableStore, table: String,
      xRange: Option[(Long, Long)], yRange: Option[(Long, Long)]): DataFrame = {
    val props = store.tableProps(table)
    val kept = keptBuckets(props, xRange, yRange)
    val (xCol, yCol) = (props("z_x_col"), props("z_y_col"))
    def exact(df: DataFrame, c: String, r: Option[(Long, Long)]): DataFrame =
      r.map { case (lo, hi) => df.filter(col(c).between(lo, hi)) }.getOrElse(df)
    val pruned = store.read(table)
      .filter(col("zbucket").isin(kept.map(Int.box): _*))
    exact(exact(pruned, xCol, xRange), yCol, yRange).drop("zbucket")
  }
}
