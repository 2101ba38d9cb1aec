package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manifest-level zone maps — per-commit min/max column statistics for
  * data skipping, the append-path complement to [[ZOrder]]'s clustered
  * layout (and the zone-map / small-materialized-aggregate design
  * Iceberg and Delta manifests publish; Moerkotte's SMA, VLDB 1998).
  *
  * The store's insert path appends ONE immutable directory per commit
  * (`Kernel/README.md`'s logged-operation stream re-based on files), so
  * naturally-ordered ingest — a time-series sink, a log shipper, an
  * id-ordered backfill — produces dirs whose tracked columns cover
  * NARROW ranges. Recording each dir's [min, max] in the table
  * manifest lets a range probe prune whole commits from the DRIVER,
  * before any file or footer is opened: read cost ∝ overlapping
  * commits, not table size. Parquet's own row-group stats still apply
  * inside the dirs that survive — this layer sits above them, where a
  * 100 TB table's million-file listing would otherwise dominate.
  *
  * Correctness never depends on the stats:
  *  - stats are keyed by directory NAME (`zm.<dir>.<col>`), and dirs
  *    are immutable and uniquely named — a stat can be MISSING for a
  *    dir (kept conservatively) but never wrong for it;
  *  - a copy-on-write rewrite (update/delete/upsert/compaction) emits
  *    NEW dir names with no stats — conservative until re-tracked;
  *  - pending schema ops change what a column means at read time, so
  *    [[readRange]] falls back to the full filtered read whenever the
  *    manifest carries op lines (stats describe raw dir bytes);
  *  - the exact predicate re-applies after the prune (the [[ZOrder]]
  *    contract), so an intersection bug could only over-read.
  *
  * Tracked columns must be BIGINT-castable (integers, epoch micros);
  * the stats aggregate runs over the JUST-WRITTEN dir only — delta-
  * sized, columnar, never the table.
  */
object ZoneMaps {

  /** Table prop naming the tracked columns (comma-joined). Pinned at
    * [[createTracked]]; every later [[Txn.insert]] consults it. */
  val ColsProp = "zm_cols"

  private[store] def statKey(dir: String, column: String) = s"zm.$dir.$column"

  /** Explicit "no values" stamp for a dir whose tracked column is
    * all-NULL (or the dir is empty): without it the key stays missing
    * forever and [[Txn.stampZoneStats]] re-aggregates the dir on every
    * subsequent insert. A NULL never satisfies a range predicate, so a
    * sentinel-stamped dir PRUNES (stronger than the conservative keep a
    * missing key gets). */
  private[store] val NullSentinel = "-"

  /** Min/max stats for `dir`'s tracked columns, as manifest props.
    * All-null (or empty) dirs stamp [[NullSentinel]]. Per column type:
    *  - integral columns stamp `min:max` longs over CAST(c AS BIGINT);
    *  - STRING columns stamp `s64:<b64 min>:<b64 max>` over the raw
    *    UTF-8 bytes (Base64 because a value may contain the separator,
    *    a newline, anything) — string intervals prune RANGE and PREFIX
    *    probes the way long intervals prune numeric ranges;
    *  - TIMESTAMP columns stamp `t64:min:max` EPOCH MICROS
    *    (unix_micros — the type's physical precision, so `ts >= X`
    *    prunes without a manual epoch cast);
    *  - DOUBLE/FLOAT columns stamp `d64:min:max` in IEEE-754
    *    TOTAL-ORDER BITS ([[sortableDoubleBits]] — a monotone long
    *    encoding, so interval disjointness in bits space IS interval
    *    disjointness in double space; -0.0 normalizes to +0.0 because
    *    the engines compare them equal, and NaN maps above +Inf
    *    matching both engines' NaN-greatest ordering).
    * Anything else (e.g. TIMESTAMP_NTZ) stamps the explicit
    * unstampable marker `u` — kept conservatively on every probe, and
    * the present key stops [[Txn.stampZoneStats]] from re-aggregating
    * the dir on every later insert (the [[NullSentinel]] rationale). */
  private[store] def statsFor(store: TableStore, table: String, dir: String,
      cols: Seq[String], partitioned: Boolean): Map[String, String] = {
    if (cols.isEmpty) return Map.empty
    val df = store.readDirs(table, Seq(dir), partitioned)
    import org.apache.spark.sql.types._
    sealed trait Kind
    case object KStr extends Kind; case object KLong extends Kind
    case object KTs extends Kind; case object KDbl extends Kind
    case object KSkip extends Kind
    val kind: Map[String, Kind] = cols.map(c => c ->
      (df.schema.fields.find(_.name == c).map(_.dataType) match {
        case Some(StringType) => KStr
        case Some(ByteType | ShortType | IntegerType | LongType) => KLong
        case Some(TimestampType) => KTs
        case Some(DoubleType | FloatType) => KDbl
        case _ => KSkip
      })).toMap
    val skipped = cols.filter(kind(_) == KSkip)
      .map(c => statKey(dir, c) -> "u").toMap
    val tracked = cols.filter(kind(_) != KSkip)
    if (tracked.isEmpty) return skipped
    // String stamps aggregate over CAST(c AS BINARY), never the String
    // itself: Parquet UTF8-annotated binary can carry invalid UTF-8,
    // which Spark orders by raw bytes (UTF8String) but Java sanitizes
    // to U+FFFD on String conversion — for bytes > 0xEF the sanitized
    // max can fall BELOW the true byte-order max and an unbounded-above
    // probe would prune a matching dir. The string→binary cast preserves
    // the UTF8String bytes and binary min/max compares unsigned
    // lexicographically — exactly [[cmpBytes]]' order.
    val aggs = tracked.flatMap { c =>
      kind(c) match {
        case KStr => Seq(min(col(c).cast("binary")), max(col(c).cast("binary")))
        case KTs => Seq(min(unix_micros(col(c))), max(unix_micros(col(c))))
        // double min/max aggregate in DOUBLE space (floats widen
        // exactly); the bits encoding happens driver-side below. Spark
        // min ignores... rather: Spark orders NaN greatest, so min is
        // NaN only when the dir is all-NaN and max is NaN when any row
        // is — both conservative under the NaN-top bits encoding.
        case KDbl => Seq(min(col(c).cast("double")), max(col(c).cast("double")))
        case _ => Seq(min(col(c).cast("long")), max(col(c).cast("long")))
      }
    }
    val r = df.agg(aggs.head, aggs.tail: _*).head
    val b64 = java.util.Base64.getEncoder
    skipped ++ tracked.zipWithIndex.map { case (c, i) =>
      if (r.isNullAt(2 * i)) statKey(dir, c) -> NullSentinel
      else kind(c) match {
        case KStr =>
          val mn = b64.encodeToString(r.getAs[Array[Byte]](2 * i))
          val mx = b64.encodeToString(r.getAs[Array[Byte]](2 * i + 1))
          statKey(dir, c) -> s"s64:$mn:$mx"
        case KTs =>
          statKey(dir, c) -> s"t64:${r.getLong(2 * i)}:${r.getLong(2 * i + 1)}"
        case KDbl =>
          val mn = sortableDoubleBits(r.getDouble(2 * i))
          val mx = sortableDoubleBits(r.getDouble(2 * i + 1))
          statKey(dir, c) -> s"d64:$mn:$mx"
        case _ =>
          statKey(dir, c) -> s"${r.getLong(2 * i)}:${r.getLong(2 * i + 1)}"
      }
    }.toMap
  }

  /** Create `table` with zone-map tracking on `cols`: the seed dir's
    * stats and the tracked-column prop land in the creating commit,
    * and every subsequent plain `insert` stamps its own dir's stats
    * automatically (the ingest path needs no special API). */
  def createTracked(store: TableStore, table: String, df: DataFrame,
      cols: Seq[String]): Unit = store.transaction { tx =>
    tx.createWithExtraProps(table, df, Map(ColsProp -> cols.mkString(",")))
    tx.stampZoneStats(table)
  }

  /** Re-stamp stats for any dirs missing them — the maintenance hook
    * after a copy-on-write rewrite or compaction replaced dirs (their
    * replacements read conservatively until re-tracked). One commit;
    * cost ∝ the unstamped dirs only. */
  def retrack(store: TableStore, table: String): Unit =
    store.transaction(_.stampZoneStats(table))

  private def parseStat(s: String): Option[(Long, Long)] = {
    val i = s.indexOf(':')
    if (i <= 0) None
    else try Some((s.take(i).toLong, s.drop(i + 1).toLong))
    catch { case _: NumberFormatException => None }
  }

  /** Range probe `lo ≤ CAST(column AS BIGINT) ≤ hi` with manifest
    * pruning: keep only dirs whose recorded interval intersects, dirs
    * without stats kept conservatively; the exact predicate re-applies
    * on top. Falls back to the full filtered read when the manifest
    * carries schema ops (stats describe pre-op bytes). */
  def readRange(store: TableStore, table: String, column: String,
      lo: Long, hi: Long): DataFrame = {
    def exact(df: DataFrame): DataFrame =
      df.filter(col(column).cast("long").between(lo, hi))
    val entries = store.currentEntries(table)
    if (entries.exists(_.isInstanceOf[OpEntry])) return exact(store.read(table))
    // a mid-evolution table mixes partition layouts; the single-flag
    // pruned read below would read some vintage under the wrong layout.
    // Fall back to the full (correct, unpruned) read — the next fold /
    // migrate collapses the history and pruning resumes
    if (entries.count(_.isInstanceOf[PartColsEntry]) > 1)
      return exact(store.read(table))
    val props = entries.collectFirst { case PropsEntry(ps) => ps }
      .getOrElse(Map.empty)
    val dirs = entries.collect { case DataDir(d) => d }
    val kept = dirs.filter(d => keepDir(props, d, column, lo, hi))
    if (kept.isEmpty) exact(store.read(table)).limit(0)
    else {
      // the pruned read bypasses readLog, so deletion vectors must
      // apply here too — a zone-map read must never resurrect
      // MOR-deleted rows (the interval stays a sound over-approximation
      // after deletes; only visibility needs re-checking)
      val dvDirs = entries.collect { case DvEntry(d) => d }
      val raw = store.readDirs(table, kept,
        entries.exists(_.isInstanceOf[PartColsEntry]),
        decorate = if (dvDirs.isEmpty) identity else store.dvStamp)
      exact(if (dvDirs.isEmpty) raw else store.applyDv(table, dvDirs, raw))
    }
  }

  /** The dirs [[readRange]] would open — the spec/monitoring probe
    * (driver-side manifest math, data never touched). */
  private[graft] def keptDirs(store: TableStore, table: String,
      column: String, lo: Long, hi: Long): Seq[String] = {
    val entries = store.currentEntries(table)
    val props = entries.collectFirst { case PropsEntry(ps) => ps }
      .getOrElse(Map.empty)
    entries.collect { case DataDir(d) => d }
      .filter(d => keepDir(props, d, column, lo, hi))
  }

  /** Keep `d` in the pruned read? All-null sentinel prunes (NULL fails
    * any range predicate), a parsed interval prunes on disjointness,
    * anything missing/unparseable keeps conservatively. */
  // shared with graft.plans.AutoSkip (the transparent read-path rule)
  private[graft] def keepDir(props: Map[String, String], d: String,
      column: String, lo: Long, hi: Long): Boolean =
    props.get(statKey(d, column)) match {
      case Some(NullSentinel) => false
      case Some(s) => parseStat(s) match {
        case Some((mn, mx)) => mx >= lo && mn <= hi
        case None => true
      }
      case None => true
    }

  // ---- string zone maps ----------------------------------------------

  /** Unsigned byte-wise comparison over UTF-8 bytes — the ORDER BOTH
    * ENGINES use for strings (Spark's UTF8String.compareTo and
    * DuckDB's collation-free default are both binary UTF-8). Java's
    * String.compareTo (UTF-16 code units) DIVERGES on supplementary
    * characters, so the comparison must run in byte space. */
  private[graft] def cmpBytes(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  /** The exclusive upper bound of the prefix range `[prefix, next)` —
    * the prefix bytes with the last non-0xFF byte incremented (bytes
    * after it dropped). None when every byte is 0xFF (no upper bound).
    * Computed in BYTE space: the incremented sequence need not be
    * valid UTF-8, which is fine because it only ever feeds
    * [[cmpBytes]], never a decoder. */
  private[graft] def prefixUpper(prefix: Array[Byte]): Option[Array[Byte]] = {
    var i = prefix.length - 1
    while (i >= 0 && prefix(i) == 0xff.toByte) i -= 1
    if (i < 0) None
    else {
      val out = prefix.take(i + 1)
      out(i) = (out(i) + 1).toByte
      Some(out)
    }
  }

  private def parseStatString(s: String): Option[(Array[Byte], Array[Byte])] =
    if (!s.startsWith("s64:")) None
    else s.drop(4).split(":", -1) match {
      case Array(mn, mx) =>
        try Some((java.util.Base64.getDecoder.decode(mn),
          java.util.Base64.getDecoder.decode(mx)))
        catch { case _: IllegalArgumentException => None }
      case _ => None
    }

  /** Keep `d` under a string interval probe? `lo`/`hi` are optional
    * UTF-8-byte bounds with per-side inclusivity (a prefix probe is
    * `[prefix, prefixUpper)`). Sentinel prunes, missing/unparseable —
    * including a NUMERIC stamp consulted with a string probe — keeps
    * conservatively. */
  private[graft] def keepDirString(props: Map[String, String], d: String,
      column: String,
      lo: Option[Array[Byte]], loIncl: Boolean,
      hi: Option[Array[Byte]], hiIncl: Boolean): Boolean =
    props.get(statKey(d, column)) match {
      case Some(NullSentinel) => false
      case Some(s) => parseStatString(s) match {
        case Some((mn, mx)) =>
          lo.forall(l => if (loIncl) cmpBytes(mx, l) >= 0
                         else cmpBytes(mx, l) > 0) &&
          hi.forall(h => if (hiIncl) cmpBytes(mn, h) <= 0
                         else cmpBytes(mn, h) < 0)
        case None => true
      }
      case None => true
    }

  private def utf8(s: String): Array[Byte] = s.getBytes("UTF-8")

  /** Inclusive string-range probe `lo ≤ column ≤ hi` with manifest
    * pruning — [[readRange]]'s contract on a STRING column (binary
    * UTF-8 order both sides of the oracle). */
  def readRangeString(store: TableStore, table: String, column: String,
      lo: String, hi: String): DataFrame =
    readPrunedString(store, table, column,
      Some(utf8(lo)), loIncl = true, Some(utf8(hi)), hiIncl = true,
      df => df.filter(col(column) >= lo && col(column) <= hi))

  /** Prefix probe `column LIKE 'prefix%'` with manifest pruning: the
    * interval `[prefix, prefixUpper)` in byte space. */
  def readPrefix(store: TableStore, table: String, column: String,
      prefix: String): DataFrame = {
    val p = utf8(prefix)
    readPrunedString(store, table, column,
      Some(p), loIncl = true, prefixUpper(p), hiIncl = false,
      df => df.filter(col(column).startsWith(prefix)))
  }

  /** The dirs a string probe would open (spec/monitoring). */
  private[graft] def keptDirsString(store: TableStore, table: String,
      column: String, lo: Option[String], hi: Option[String]): Seq[String] = {
    val entries = store.currentEntries(table)
    val props = entries.collectFirst { case PropsEntry(ps) => ps }
      .getOrElse(Map.empty)
    entries.collect { case DataDir(d) => d }
      .filter(d => keepDirString(props, d, column,
        lo.map(utf8), loIncl = true, hi.map(utf8), hiIncl = true))
  }

  // ---- timestamp / double zone maps ------------------------------------

  /** IEEE-754 double → order-preserving signed long (Lucene's
    * sortable-bits construction): positive doubles keep their bit
    * pattern, negative doubles flip every bit except the sign, so
    * signed-long comparison of the encodings equals double comparison
    * of the values. Two engine-semantics adjustments:
    *  - -0.0 normalizes to +0.0 BEFORE encoding — Spark and DuckDB
    *    compare them EQUAL, but their raw encodings differ, and a dir
    *    whose max is -0.0 must keep the probe `col >= 0.0`;
    *  - NaN (canonicalized by doubleToLongBits) encodes above +Inf —
    *    both engines order NaN greatest, so an all-NaN dir prunes
    *    `col <= x` (no NaN satisfies it) and keeps `col >= x` (every
    *    NaN does). */
  private[graft] def sortableDoubleBits(dbl: Double): Long = {
    val d = if (dbl == 0.0) 0.0 else dbl
    val b = java.lang.Double.doubleToLongBits(d)
    b ^ ((b >> 63) & 0x7fffffffffffffffL)
  }

  /** Keep `d` under an inclusive [lo, hi] long-space probe against a
    * TAGGED stamp (`t64:` epoch micros, `d64:` double bits). Sentinel
    * prunes; a missing key, an untagged stamp, or a DIFFERENT tag —
    * e.g. a t64 probe consulting an integral stamp — keeps
    * conservatively (the probe and the stamp must speak the same
    * space for disjointness to mean anything). */
  private[graft] def keepDirTagged(props: Map[String, String], d: String,
      column: String, tag: String, lo: Long, hi: Long): Boolean =
    props.get(statKey(d, column)) match {
      case Some(NullSentinel) => false
      case Some(s) if s.startsWith(tag) => parseStat(s.drop(tag.length)) match {
        case Some((mn, mx)) => mx >= lo && mn <= hi
        case None => true
      }
      case Some(_) => true
      case None => true
    }

  /** Epoch-micros range probe `lo ≤ unix_micros(column) ≤ hi` on a
    * TIMESTAMP column with manifest pruning — [[readRange]]'s contract
    * against the `t64` stamps. */
  def readRangeMicros(store: TableStore, table: String, column: String,
      lo: Long, hi: Long): DataFrame =
    readPrunedTagged(store, table, column, "t64:", lo, hi,
      df => df.filter(unix_micros(col(column)).between(lo, hi)))

  /** Inclusive double range probe `lo ≤ column ≤ hi` on a DOUBLE/FLOAT
    * column with manifest pruning over the `d64` total-order-bits
    * stamps. NaN bounds are rejected: a NaN endpoint makes the exact
    * predicate vacuous and the bits interval meaningless. */
  def readRangeDouble(store: TableStore, table: String, column: String,
      lo: Double, hi: Double): DataFrame = {
    require(!lo.isNaN && !hi.isNaN, "NaN range bounds are not a probe")
    readPrunedTagged(store, table, column, "d64:",
      sortableDoubleBits(lo), sortableDoubleBits(hi),
      df => df.filter(col(column).cast("double").between(lo, hi)))
  }

  /** The dirs a tagged-interval probe would open (spec/monitoring). */
  private[graft] def keptDirsTagged(store: TableStore, table: String,
      column: String, tag: String, lo: Long, hi: Long): Seq[String] = {
    val entries = store.currentEntries(table)
    val props = entries.collectFirst { case PropsEntry(ps) => ps }
      .getOrElse(Map.empty)
    entries.collect { case DataDir(d) => d }
      .filter(d => keepDirTagged(props, d, column, tag, lo, hi))
  }

  private def readPrunedTagged(store: TableStore, table: String,
      column: String, tag: String, lo: Long, hi: Long,
      exact: DataFrame => DataFrame): DataFrame = {
    val entries = store.currentEntries(table)
    if (entries.exists(_.isInstanceOf[OpEntry])) return exact(store.read(table))
    if (entries.count(_.isInstanceOf[PartColsEntry]) > 1)
      return exact(store.read(table))
    val props = entries.collectFirst { case PropsEntry(ps) => ps }
      .getOrElse(Map.empty)
    val kept = entries.collect { case DataDir(d) => d }
      .filter(d => keepDirTagged(props, d, column, tag, lo, hi))
    if (kept.isEmpty) exact(store.read(table)).limit(0)
    else {
      val dvDirs = entries.collect { case DvEntry(d) => d }
      val raw = store.readDirs(table, kept,
        entries.exists(_.isInstanceOf[PartColsEntry]),
        decorate = if (dvDirs.isEmpty) identity else store.dvStamp)
      exact(if (dvDirs.isEmpty) raw else store.applyDv(table, dvDirs, raw))
    }
  }

  private def readPrunedString(store: TableStore, table: String,
      column: String, lo: Option[Array[Byte]], loIncl: Boolean,
      hi: Option[Array[Byte]], hiIncl: Boolean,
      exact: DataFrame => DataFrame): DataFrame = {
    val entries = store.currentEntries(table)
    if (entries.exists(_.isInstanceOf[OpEntry])) return exact(store.read(table))
    if (entries.count(_.isInstanceOf[PartColsEntry]) > 1)
      return exact(store.read(table))
    val props = entries.collectFirst { case PropsEntry(ps) => ps }
      .getOrElse(Map.empty)
    val kept = entries.collect { case DataDir(d) => d }
      .filter(d => keepDirString(props, d, column, lo, loIncl, hi, hiIncl))
    if (kept.isEmpty) exact(store.read(table)).limit(0)
    else {
      val dvDirs = entries.collect { case DvEntry(d) => d }
      val raw = store.readDirs(table, kept,
        entries.exists(_.isInstanceOf[PartColsEntry]),
        decorate = if (dvDirs.isEmpty) identity else store.dvStamp)
      exact(if (dvDirs.isEmpty) raw else store.applyDv(table, dvDirs, raw))
    }
  }
}
