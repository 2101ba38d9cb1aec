package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mutable KMV buffer: `hs(0 until n)` is the sorted set of the n
  * smallest DISTINCT hashes seen so far, n ≤ k, backed by a
  * fixed-capacity array so reduce never reallocates. */
final case class KmvBuf(var n: Int, hs: Array[Long])

/** The sketch summary: how many distinct hashes the buffer holds
  * (min(distinct, k)) and the k-th minimum (the largest retained). */
final case class KmvSummary(n_k: Long, kth: Long)

/** KMV (k-minimum-values) distinct-count sketch as a typed
  * [[Aggregator]] — the BOUNDED one-pass form of the a18 gate
  * (Bar-Yossef et al. 2002, "Counting distinct elements in a data
  * stream"; the theta-sketch family's production layout).
  *
  * Semantics: per group, retain the k smallest DISTINCT hash values;
  * the summary (n_k, kth) determines the estimate
  * `(k-1) · 2^60 / kth` exactly as the order-statistics identity
  * specifies. Retaining "distinct hashes" (not distinct inputs) is the
  * deliberate convention: duplicates of a value hash identically and
  * are rejected at insert, and a 2⁻⁶⁰-probability collision between
  * two values is deduplicated the same way a `SELECT DISTINCT h`
  * oracle deduplicates it — both engines see the identical hash set,
  * so the gate stays hash-strict without either engine materializing
  * the distinct VALUE set.
  *
  * Scale contract (the reason this class exists — r14 verdict item 1):
  * planned via `functions.udaf` this is a `TypedImperativeAggregate`,
  * so Spark runs it as ObjectHashAggregate with a map-side PARTIAL
  * pass; the only exchange carries one serialized buffer — ≤ k longs —
  * per (map task, key), never the distinct set. The window form it
  * replaces shuffled every distinct (key, value) pair. Mergeability
  * (`merge(a, b)` ≡ sketch of the union) is the property RelationalSpec
  * proved for the window form and KmvSketchSpec pins for this buffer.
  *
  * Cost: reduce is O(log k) when the hash is rejected (present, or ≥
  * the current k-th min on a full buffer — the steady state on big
  * groups) and O(k) arraycopy when it lands; merge is O(k log k)
  * worst-case via repeated insert — at k=256 that is ~2k word moves
  * per map-task buffer, noise next to the shuffle it deletes.
  */
final class KmvSketchAgg(k: Int) extends Aggregator[Long, KmvBuf, KmvSummary] {
  require(k > 0, s"KMV needs k > 0, got $k")

  override def zero: KmvBuf = KmvBuf(0, new Array[Long](k))

  override def reduce(b: KmvBuf, h: Long): KmvBuf = { insert(b, h); b }

  override def merge(b1: KmvBuf, b2: KmvBuf): KmvBuf = {
    var i = 0
    while (i < b2.n) { insert(b1, b2.hs(i)); i += 1 }
    b1
  }

  override def finish(b: KmvBuf): KmvSummary =
    KmvSummary(b.n.toLong, if (b.n == 0) 0L else b.hs(b.n - 1))

  override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  override def outputEncoder: Encoder[KmvSummary] = Encoders.product[KmvSummary]

  /** Sorted-insert of h into the capped distinct prefix; no-op when h
    * is already present or cannot rank among the k minima. */
  private[functions] def insert(b: KmvBuf, h: Long): Unit = {
    if (b.n == k && h >= b.hs(k - 1)) return // O(1) steady-state reject
    var lo = 0
    var hi = b.n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (b.hs(mid) < h) lo = mid + 1 else hi = mid
    }
    if (lo < b.n && b.hs(lo) == h) return // distinct-hash semantics
    val tail = math.min(b.n, k - 1) // full buffer: k-th min falls off
    System.arraycopy(b.hs, lo, b.hs, lo + 1, tail - lo)
    b.hs(lo) = h
    if (b.n < k) b.n += 1
  }
}

/** [[KmvSketchAgg]] emitting the sketch's VALUES — the ascending array
  * of the ≤ k minimum distinct hashes — instead of the (n, kth)
  * summary. This is the representation the THETA-SKETCH SET ALGEBRA
  * needs (a19): with each operand's full k-min sample in hand,
  * intersection and union cardinalities are pure array expressions
  * over ≤ k-long columns (Dasgupta et al., "Theta Sketch Framework:
  * estimation of set expression cardinalities", and the KMV set-ops in
  * Beyer et al. 2007) — no second pass over the data, no exchange
  * wider than k longs per (task, key). Same buffer, same insert, same
  * merge algebra as the summary form; only `finish` differs. */
final class KmvValuesAgg(k: Int) extends Aggregator[Long, KmvBuf, Array[Long]] {
  private val core = new KmvSketchAgg(k)
  override def zero: KmvBuf = core.zero
  override def reduce(b: KmvBuf, h: Long): KmvBuf = core.reduce(b, h)
  override def merge(b1: KmvBuf, b2: KmvBuf): KmvBuf = core.merge(b1, b2)
  override def finish(b: KmvBuf): Array[Long] =
    java.util.Arrays.copyOf(b.hs, b.n)
  override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

/** [[KmvSketchAgg]] over a BOXED nullable hash input: NULL hashes are
  * SKIPPED, the `COUNT(DISTINCT x)` convention (NULL is the absence of
  * a value, not a 257th value). This is the form the composable
  * [[KmvSketch.approxDistinct]] column uses: there the hash derives
  * from arbitrary user data (`md5(NULL)` is NULL), and routing that
  * NULL into the primitive-Long aggregator would either coerce it to a
  * spurious 0 hash or fail in the encoder — both diverging from the
  * oracle's NULL semantics. The gate aggregators keep the primitive
  * form (their hash inputs are non-null by construction; boxing the
  * hot path buys nothing). */
final class KmvSketchAggNullable(k: Int)
    extends Aggregator[java.lang.Long, KmvBuf, KmvSummary] {
  private val core = new KmvSketchAgg(k)
  override def zero: KmvBuf = core.zero
  override def reduce(b: KmvBuf, h: java.lang.Long): KmvBuf =
    if (h == null) b else core.reduce(b, h.longValue)
  override def merge(b1: KmvBuf, b2: KmvBuf): KmvBuf = core.merge(b1, b2)
  override def finish(b: KmvBuf): KmvSummary = core.finish(b)
  override def bufferEncoder: Encoder[KmvBuf] = core.bufferEncoder
  override def outputEncoder: Encoder[KmvSummary] = core.outputEncoder
}

object KmvSketch {
  /** Estimated distinct count of `c` as ONE deterministic BIGINT
    * aggregate column — the a18 sketch packaged for composition (the
    * HeroQL `@aggregate(approx_distinct(v))` builtin's engine): md5-
    * 60bit hash (the oracle-shared family), KMV buffer, exact below k,
    * `floor((k−1)·2^60 / h_(k))` at or above. Every arithmetic step is
    * the order statistics + the one double expression both engines
    * compute identically, so language queries using it stay
    * hash-strict against DuckDB. NULL inputs hash to NULL and are
    * skipped by the nullable aggregator — `COUNT(DISTINCT x)`'s NULL
    * policy; an oracle for a nullable column must likewise
    * `WHERE x IS NOT NULL` before hashing. */
  def approxDistinct(c: org.apache.spark.sql.Column,
      k: Int = 256): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val kmv = udaf(new KmvSketchAggNullable(k))
    val h = conv(substring(md5(c.cast("string").cast("binary")), 1, 15),
      16, 10).cast("long")
    val sk = kmv(h)
    when(sk.getField("n_k") < k, sk.getField("n_k"))
      .otherwise(floor(lit((k - 1).toDouble) * lit(1152921504606846976.0) /
        sk.getField("kth").cast("double")).cast("long"))
  }

  /** TUPLE-sketch estimate of Σ over DISTINCT `key`s of max(`value`)
    * as ONE deterministic BIGINT aggregate column — a20's engine
    * packaged for the HeroQL `@aggregate(approx_sum_distinct(k, v))`
    * builtin: md5-60bit hash of the key (the oracle-shared family),
    * max-combined summaries on the ≤ k retained minima, exact below k,
    * `floor(Σ(sub-θ summaries) · 2^60 / θ)` at or above. NULL keys
    * hash to NULL and are skipped (the distinct-aggregation NULL
    * policy); a NULL value max-combines as Long.MinValue would be
    * wrong, so callers must feed non-null values (the language's typed
    * relations guarantee it). Deterministic order statistics + integer
    * summaries → language queries stay hash-strict against DuckDB. */
  def approxSumDistinct(key: org.apache.spark.sql.Column,
      value: org.apache.spark.sql.Column,
      k: Int = 256): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val tup = udaf(new KmvTupleAggNullable(k, "max"))
    val h = conv(substring(md5(key.cast("string").cast("binary")), 1, 15),
      16, 10).cast("long")
    val sk = tup(h, value.cast("long"))
    when(sk.getField("n_k") < k, sk.getField("s_below"))
      .otherwise(floor(sk.getField("s_below").cast("double") *
        lit(1152921504606846976.0) /
        sk.getField("theta").cast("double")).cast("long"))
  }

  /** MEDIAN estimate of `value` over the group's row MULTISET as ONE
    * deterministic BIGINT aggregate column — a21's bottom-k sample
    * sketch packaged for the HeroQL `@aggregate(approx_median(id, v))`
    * builtin. `id` names the ROW IDENTITY (quantiles are multiset
    * statistics, so the sample must be keyed by row, not by value —
    * the same reason a21 hashes orderkey_linenumber): rows whose
    * md5-60bit id-hash ranks among the k minima are retained with
    * their values, and the nearest-rank p50 of the retained ascending
    * sample — `ceil(m/2)` 1-indexed — is the estimate, EXACT below k,
    * ε = O(1/√k) rank error above. NULL ids or values are skipped
    * (the family's NULL policy). Deterministic order statistics →
    * language queries stay hash-strict against DuckDB. */
  def approxMedian(id: org.apache.spark.sql.Column,
      value: org.apache.spark.sql.Column,
      k: Int = 256): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val smp = udaf(new KmvSampleAggNullable(k))
    val h = conv(substring(md5(id.cast("string").cast("binary")), 1, 15),
      16, 10).cast("long")
    val sample = smp(h, value.cast("long"))
    // a group whose ids or values are all NULL yields an empty sample:
    // the estimate is NULL (DuckDB's quantile-of-nothing), not an ANSI
    // INVALID_ARRAY_INDEX from element_at(sample, 1)
    when(size(sample) > 0,
      element_at(sample,
        greatest(lit(1), floor((size(sample) + lit(1)) / lit(2)).cast("int"))))
  }

  /** [[approxMedian]]'s sample at an ARBITRARY quantile point: the
    * nearest-rank p-quantile — `ceil(p·m)` 1-indexed, clamped ≥ 1 — of
    * the retained ascending sample (for p = 0.5 this picks the same
    * element as approxMedian's `ceil(m/2)`). EXACT below k, ε =
    * O(1/√k) rank error above; deterministic, so language gates stay
    * hash-strict against DuckDB. NULL on an empty sample. */
  def approxQuantile(id: org.apache.spark.sql.Column,
      value: org.apache.spark.sql.Column, p: Double,
      k: Int = 256): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    require(p > 0.0 && p <= 1.0, s"quantile point $p outside (0, 1]")
    val smp = udaf(new KmvSampleAggNullable(k))
    val h = conv(substring(md5(id.cast("string").cast("binary")), 1, 15),
      16, 10).cast("long")
    val sample = smp(h, value.cast("long"))
    when(size(sample) > 0, rankPick(sample, p))
  }

  /** Several quantile points from ONE sketch pass, as an array in the
    * callers' point order (a21's multi-quantile shape as a reusable
    * aggregate — the sample aggregates once; each point is a rank pick
    * on the shared array). NULL on an empty sample. */
  def approxQuantiles(id: org.apache.spark.sql.Column,
      value: org.apache.spark.sql.Column, ps: Seq[Double],
      k: Int = 256): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      s"quantile points $ps outside (0, 1]")
    val smp = udaf(new KmvSampleAggNullable(k))
    val h = conv(substring(md5(id.cast("string").cast("binary")), 1, 15),
      16, 10).cast("long")
    val sample = smp(h, value.cast("long"))
    when(size(sample) > 0, array(ps.map(p => rankPick(sample, p)): _*))
  }

  private def rankPick(sample: org.apache.spark.sql.Column,
      p: Double): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    element_at(sample,
      greatest(lit(1), ceil(lit(p) * size(sample)).cast("int")))
  }
}

/** Buffer of the TUPLE sketch: the sorted ≤ k minimum distinct hashes
  * plus one combinable summary per retained hash. */
final case class KmvTupleBuf(var n: Int, hs: Array[Long], vs: Array[Long])

/** The tuple-sketch summary the estimate needs: retained count, θ
  * (2^60 below k, else the k-th minimum), and the summed summaries of
  * the sub-θ sample (all of them below k, the k−1 smallest at k). */
final case class KmvTupleOut(n_k: Long, theta: Long, s_below: Long)

/** TUPLE sketch over KMV samples (the DataSketches Tuple Sketch:
  * theta sketches "with values") — estimates an AGGREGATE OVER
  * DISTINCT KEYS, the quantity a plain aggregation cannot reach
  * without first shuffling the per-key groups: each retained minimum
  * hash carries a summary combined from every row of that hash
  * (`max` or `sum`), and Σ(summaries below θ) · 2^60/θ estimates the
  * total over ALL distinct keys. Retention is sound for the same
  * monotone-threshold reason KMV is exact: a hash below the final θ
  * is below every intermediate threshold that saw it, so its summary
  * accumulated every row; a hash ever evicted can never re-enter
  * (thresholds only shrink). Deterministic given hashes and integer
  * summaries → oracle-strict. Bounded exactly like [[KmvSketchAgg]]:
  * the one exchange carries ≤ k (hash, summary) pairs per (task,
  * key). */
/** [[KmvTupleAgg]] over BOXED nullable inputs: rows whose KEY hash is
  * NULL are skipped — [[KmvSketchAggNullable]]'s policy for the
  * composable [[KmvSketch.approxSumDistinct]] column, where the hash
  * derives from arbitrary user data. */
final class KmvTupleAggNullable(k: Int, combine: String)
    extends Aggregator[(java.lang.Long, java.lang.Long), KmvTupleBuf, KmvTupleOut] {
  private val core = new KmvTupleAgg(k, combine)
  override def zero: KmvTupleBuf = core.zero
  override def reduce(b: KmvTupleBuf, in: (java.lang.Long, java.lang.Long)): KmvTupleBuf =
    if (in._1 == null || in._2 == null) b
    else core.reduce(b, (in._1.longValue, in._2.longValue))
  override def merge(b1: KmvTupleBuf, b2: KmvTupleBuf): KmvTupleBuf =
    core.merge(b1, b2)
  override def finish(b: KmvTupleBuf): KmvTupleOut = core.finish(b)
  override def bufferEncoder: Encoder[KmvTupleBuf] = core.bufferEncoder
  override def outputEncoder: Encoder[KmvTupleOut] = core.outputEncoder
}

/** MERGEABLE QUANTILE SKETCH as a bottom-k hash sample (Cohen &
  * Kaplan, "Summarizing data using bottom-k sketches", PODC 2007; the
  * order-sample member of the KMV family): retain the rows whose
  * ROW-HASH ranks among the k minima, carrying each retained row's
  * VALUE; quantiles of the retained value multiset estimate the
  * group's quantiles with ε = O(1/√k) rank error, exact below k.
  *
  * Why this and not KLL/GK (the verdict's suggestion evaluated):
  * both compact by decisions that depend on ARRIVAL/MERGE ORDER — KLL
  * keeps odd-or-even survivors per compaction, GK's tuple bands depend
  * on insertion sequence — so two executions with different partial
  * orders emit different (all individually valid) summaries. Spark
  * does not fix merge order, so those sketches cannot be hash-strict
  * against any oracle (the ann9 one-ULP argument in sketch form). The
  * bottom-k sample IS a pure function of the input multiset: the k
  * minimum row-hashes are the same set under any partitioning, so the
  * emitted sample — and every rank statistic over it — is
  * bit-reproducible and DuckDB computes the identical integers.
  *
  * Determinism under 2⁻⁶⁰ row-hash collisions: on hash equality the
  * buffer max-combines the values ([[KmvTupleAgg]]'s rule), and the
  * oracle mirrors with `GROUP BY hash → max(value)`, so even a
  * collision cannot make the gate order-dependent.
  *
  * Same bounded-exchange contract as the rest of the family: planned
  * via `functions.udaf` this is ObjectHashAggregate with a map-side
  * PARTIAL pass, and the only exchange carries ≤ k (hash, value)
  * pairs per (task, key) — a full sort/exact-percentile of a 100 TB
  * group never happens; cost is one scan plus a k-sized merge. */
final class KmvSampleAgg(k: Int)
    extends Aggregator[(Long, Long), KmvTupleBuf, Array[Long]] {
  private val core = new KmvTupleAgg(k, "max")
  override def zero: KmvTupleBuf = core.zero
  override def reduce(b: KmvTupleBuf, in: (Long, Long)): KmvTupleBuf =
    core.reduce(b, in)
  override def merge(b1: KmvTupleBuf, b2: KmvTupleBuf): KmvTupleBuf =
    core.merge(b1, b2)
  /** The retained sample's VALUES, ascending — the form rank
    * statistics index directly (`element_at(sample, rank)`). */
  override def finish(b: KmvTupleBuf): Array[Long] = {
    val out = java.util.Arrays.copyOf(b.vs, b.n)
    java.util.Arrays.sort(out)
    out
  }
  override def bufferEncoder: Encoder[KmvTupleBuf] = core.bufferEncoder
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

/** [[KmvSampleAgg]] over BOXED nullable inputs: rows whose row-identity
  * hash or value is NULL are skipped — the policy of the composable
  * [[KmvSketch.approxMedian]] column, where the hash derives from
  * arbitrary user data (mirrors [[KmvTupleAggNullable]]). */
final class KmvSampleAggNullable(k: Int)
    extends Aggregator[(java.lang.Long, java.lang.Long), KmvTupleBuf, Array[Long]] {
  private val core = new KmvSampleAgg(k)
  override def zero: KmvTupleBuf = core.zero
  override def reduce(b: KmvTupleBuf, in: (java.lang.Long, java.lang.Long)): KmvTupleBuf =
    if (in._1 == null || in._2 == null) b
    else core.reduce(b, (in._1.longValue, in._2.longValue))
  override def merge(b1: KmvTupleBuf, b2: KmvTupleBuf): KmvTupleBuf =
    core.merge(b1, b2)
  override def finish(b: KmvTupleBuf): Array[Long] = core.finish(b)
  override def bufferEncoder: Encoder[KmvTupleBuf] = core.bufferEncoder
  override def outputEncoder: Encoder[Array[Long]] = core.outputEncoder
}

final class KmvTupleAgg(k: Int, combine: String)
    extends Aggregator[(Long, Long), KmvTupleBuf, KmvTupleOut] {
  require(combine == "max" || combine == "sum",
    s"tuple-sketch combine must be max or sum, got $combine")
  private val isMax = combine == "max"

  override def zero: KmvTupleBuf =
    KmvTupleBuf(0, new Array[Long](k), new Array[Long](k))

  override def reduce(b: KmvTupleBuf, in: (Long, Long)): KmvTupleBuf = {
    insert(b, in._1, in._2); b
  }

  override def merge(b1: KmvTupleBuf, b2: KmvTupleBuf): KmvTupleBuf = {
    var i = 0
    while (i < b2.n) { insert(b1, b2.hs(i), b2.vs(i)); i += 1 }
    b1
  }

  override def finish(b: KmvTupleBuf): KmvTupleOut = {
    if (b.n < k) {
      var s = 0L; var i = 0
      while (i < b.n) { s += b.vs(i); i += 1 }
      KmvTupleOut(b.n.toLong, 1152921504606846976L, s)
    } else {
      var s = 0L; var i = 0
      while (i < k - 1) { s += b.vs(i); i += 1 } // strictly below θ
      KmvTupleOut(k.toLong, b.hs(k - 1), s)
    }
  }

  override def bufferEncoder: Encoder[KmvTupleBuf] = Encoders.product[KmvTupleBuf]
  override def outputEncoder: Encoder[KmvTupleOut] = Encoders.product[KmvTupleOut]

  private def insert(b: KmvTupleBuf, h: Long, v: Long): Unit = {
    if (b.n == k && h > b.hs(k - 1)) return
    var lo = 0
    var hi = b.n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (b.hs(mid) < h) lo = mid + 1 else hi = mid
    }
    if (lo < b.n && b.hs(lo) == h) { // present: combine the summary
      b.vs(lo) = if (isMax) math.max(b.vs(lo), v) else b.vs(lo) + v
      return
    }
    if (b.n == k) { // full and h is new: h < hs(k-1), evict the k-th
      System.arraycopy(b.hs, lo, b.hs, lo + 1, k - 1 - lo)
      System.arraycopy(b.vs, lo, b.vs, lo + 1, k - 1 - lo)
    } else {
      System.arraycopy(b.hs, lo, b.hs, lo + 1, b.n - lo)
      System.arraycopy(b.vs, lo, b.vs, lo + 1, b.n - lo)
      b.n += 1
    }
    b.hs(lo) = h
    b.vs(lo) = v
  }
}
