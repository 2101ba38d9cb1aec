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
    * All-null (or empty) dirs stamp [[NullSentinel]]. */
  private[store] def statsFor(store: TableStore, table: String, dir: String,
      cols: Seq[String], partitioned: Boolean): Map[String, String] = {
    if (cols.isEmpty) return Map.empty
    val df = store.readDirs(table, Seq(dir), partitioned)
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("long")), max(col(c).cast("long"))))
    val r = df.agg(aggs.head, aggs.tail: _*).head
    cols.zipWithIndex.map { case (c, i) =>
      if (r.isNullAt(2 * i)) statKey(dir, c) -> NullSentinel
      else statKey(dir, c) -> s"${r.getLong(2 * i)}:${r.getLong(2 * i + 1)}"
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
}
