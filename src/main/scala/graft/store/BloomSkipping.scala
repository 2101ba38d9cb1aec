package graft.store

import java.util.Base64

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manifest-level Bloom filters — per-commit membership summaries for
  * EQUALITY data skipping, the point-probe complement to
  * [[ZoneMaps]]' range stats (Bloom, CACM 1970; the same layer Parquet
  * footers and Iceberg puffin files publish, lifted to the manifest
  * where a probe can prune whole commits from the DRIVER).
  *
  * Zone maps prune when ingest is VALUE-ORDERED (each dir covers a
  * narrow [min,max]). They are blind to the other common layout:
  * hash/entity-banded ingest — a per-user backfill, a shard-keyed
  * log, a mod-N bucketing — where every dir spans the full value
  * RANGE but holds a narrow value SET. A per-dir Bloom filter prunes
  * exactly there: `WHERE user_id = ?` keeps only the dirs whose
  * filter may contain the key, so read cost is ∝ dirs that genuinely
  * hold it (+ the fp rate), not table size.
  *
  * Correctness never depends on the filters (the [[ZoneMaps]]
  * contract, point-probe form):
  *  - a Bloom filter has NO false negatives: a dir containing the key
  *    always tests positive, so pruning can never drop a matching row;
  *  - filters are keyed by immutable dir name (`bf.<dir>.<col>`) — a
  *    stamp can be missing (dir kept conservatively) but never wrong;
  *  - rewrites emit new dir names with no stamps — conservative until
  *    [[retrack]];
  *  - pending schema ops ⇒ full filtered read (stamps describe raw
  *    dir bytes);
  *  - the exact predicate re-applies after the prune, so a filter bug
  *    could only over-read, and a false POSITIVE only costs one extra
  *    dir scan.
  *
  * Scale posture: the manifest holds `m/8` bytes per (dir, column) —
  * `m` is pinned at creation, sized to the per-commit key cardinality
  * (default 2^15 bits ≈ 4 KB ≈ 2% fp at 4k keys/dir), and the
  * compaction hooks keep dir count bounded, so the driver-side
  * manifest stays MBs at 100 TB. Both hash sides are the engine's own
  * codegen'd xxhash64, seeds 0..h−1 — over the BIGINT-cast column for
  * numeric keys (the zone-map cast contract) and over the raw value
  * for string keys — so stamp and probe agree bit-for-bit.
  */
object BloomSkipping {

  /** Table prop naming the tracked columns (comma-joined); pinned at
    * [[createTracked]], consulted by every later [[Txn.insert]]. */
  val ColsProp = "bf_cols"
  /** Filter size in BITS (power of two not required; positions are
    * `pmod(hash, m)`). Creation-pinned: probe and stamp must agree. */
  val BitsProp = "bf_m"
  /** Number of hash functions (xxhash64 seeds `0..h-1`). */
  val HashesProp = "bf_h"

  val DefaultBits = 1 << 15
  val DefaultHashes = 4

  private[store] def statKey(dir: String, column: String) = s"bf.$dir.$column"

  /** All-NULL / empty dir: NULL never equals a probe key, so the
    * sentinel PRUNES (and stops per-insert re-aggregation). */
  private[store] val NullSentinel = "-"

  /** The h bit positions of `c` under (m, h) — the ONE hash expression
    * both the stamp and the probe evaluate (engine-codegen'd xxhash64,
    * seed-salted). `c` must already be in [[hashable]] form. */
  private def positions(c: org.apache.spark.sql.Column, m: Int,
      h: Int): Seq[org.apache.spark.sql.Column] =
    (0 until h).map(i => pmod(xxhash64(c, lit(i)), lit(m.toLong)))

  /** The hashable form of a tracked column: numeric columns go through
    * the BIGINT cast (the zone-map cast contract — an INT ingest and a
    * BIGINT probe must hash alike), everything else (string entity
    * ids, the most common real key of an entity-banded layout) hashes
    * its RAW value — xxhash64 over the string bytes. The probe side
    * mirrors this per key type in [[keyPositions]]. */
  private def hashable(c: org.apache.spark.sql.Column,
      dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.Column =
    dt match {
      case _: org.apache.spark.sql.types.NumericType => c.cast("long")
      case _ => c
    }

  /** A probe key's h bit positions, evaluated DRIVER-SIDE on the same
    * Catalyst expressions the stamp ran through codegen (literal
    * inputs → foldable → `eval`; eval and codegen agree by Spark's
    * contract, and BloomSpec pins stamp/probe bit parity). Long keys
    * take the numeric-cast hash form, string keys the raw form. */
  private[graft] def keyPositions(key: Any, m: Int, h: Int): Seq[Int] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Pmod, XxHash64}
    val base = key match {
      case n: Byte => Literal(n.toLong)
      case n: Short => Literal(n.toLong)
      case n: Int => Literal(n.toLong)
      case n: Long => Literal(n)
      case other => Literal.create(other) // strings: raw-value hash
    }
    (0 until h).map(i =>
      Pmod(new XxHash64(Seq(base, Literal(i))), Literal(m.toLong))
        .eval(null).asInstanceOf[Long].toInt)
  }

  /** Bloom bitsets for `dir`'s tracked columns, as manifest props
    * (base64 little-endian long words). One delta-sized scan per
    * column; the collect is bounded by m distinct positions. */
  private[store] def bloomsFor(store: TableStore, table: String, dir: String,
      cols: Seq[String], m: Int, h: Int,
      partitioned: Boolean): Map[String, String] = {
    if (cols.isEmpty) return Map.empty
    val df = store.readDirs(table, Seq(dir), partitioned)
    cols.map { c =>
      val hc = hashable(col(c), df.schema(c).dataType)
      val pos = df.filter(col(c).isNotNull)
        .select(explode(array(positions(hc, m, h): _*)).as("p"))
        .distinct().collect().map(_.getLong(0).toInt)
      if (pos.isEmpty) statKey(dir, c) -> NullSentinel
      else {
        val words = new Array[Long]((m + 63) / 64)
        pos.foreach(p => words(p >> 6) |= 1L << (p & 63))
        val bb = java.nio.ByteBuffer.allocate(words.length * 8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        words.foreach(bb.putLong)
        statKey(dir, c) -> Base64.getEncoder.encodeToString(bb.array())
      }
    }.toMap
  }

  /** Create `table` with Bloom tracking on `cols`: the seed dir's
    * filters and the (cols, m, h) props land in the creating commit;
    * every subsequent plain `insert` stamps its own dir automatically
    * (the ingest path needs no special API). */
  def createTracked(store: TableStore, table: String, df: DataFrame,
      cols: Seq[String], bits: Int = DefaultBits,
      hashes: Int = DefaultHashes): Unit = store.transaction { tx =>
    tx.createWithExtraProps(table, df, Map(
      ColsProp -> cols.mkString(","),
      BitsProp -> bits.toString, HashesProp -> hashes.toString))
    tx.stampBlooms(table)
  }

  /** Re-stamp any dirs missing filters (post-rewrite maintenance; one
    * commit, cost ∝ unstamped dirs only). */
  def retrack(store: TableStore, table: String): Unit =
    store.transaction(_.stampBlooms(table))

  /** Equality probe `CAST(column AS BIGINT) = key` with manifest
    * pruning: keep only dirs whose filter may contain the key; dirs
    * without stamps kept conservatively; the exact predicate
    * re-applies on top. Full filtered read when the manifest carries
    * schema ops or a mid-evolution layout (the [[ZoneMaps.readRange]]
    * fallbacks). */
  def readEquals(store: TableStore, table: String, column: String,
      key: Long): DataFrame =
    readPruned(store, table, column, Seq(key),
      df => df.filter(col(column).cast("long") === key))

  /** [[readEquals]] for a STRING key column (`column = 'key'`): the
    * stamp hashed the raw string value, the probe hashes the literal
    * the same way — per-entity layouts keyed by string ids prune like
    * numeric ones. */
  def readEquals(store: TableStore, table: String, column: String,
      key: String): DataFrame =
    readPruned(store, table, column, Seq(key),
      df => df.filter(col(column) === key))

  /** Batch point lookup `CAST(column AS BIGINT) IN (keys)` with
    * manifest pruning — the dim-key fetch shape: kept dirs are the
    * UNION of each key's kept set (driver-side manifest math, never a
    * data scan), so read cost is ∝ dirs that may hold ANY of the
    * keys. Same fallbacks and exact re-filter as [[readEquals]]. */
  def readIn(store: TableStore, table: String, column: String,
      keys: Seq[Long]): DataFrame = {
    if (keys.isEmpty) return store.read(table).limit(0)
    readPruned(store, table, column, keys,
      df => df.filter(col(column).cast("long").isin(keys: _*)))
  }

  /** [[readIn]] for STRING keys. */
  def readInStrings(store: TableStore, table: String, column: String,
      keys: Seq[String]): DataFrame = {
    if (keys.isEmpty) return store.read(table).limit(0)
    readPruned(store, table, column, keys,
      df => df.filter(col(column).isin(keys: _*)))
  }

  private def readPruned(store: TableStore, table: String, column: String,
      keys: Seq[Any], exact: DataFrame => DataFrame): DataFrame = {
    val entries = store.currentEntries(table)
    if (entries.exists(_.isInstanceOf[OpEntry])) return exact(store.read(table))
    if (entries.count(_.isInstanceOf[PartColsEntry]) > 1)
      return exact(store.read(table))
    val kept = keptOf(entries, column, keys)
    if (kept.isEmpty) exact(store.read(table)).limit(0)
    else {
      // the pruned read bypasses readLog, so deletion vectors apply
      // here too (a membership stamp stays a sound over-approximation
      // after deletes; only visibility needs re-checking)
      val dvDirs = entries.collect { case DvEntry(d) => d }
      val raw = store.readDirs(table, kept,
        entries.exists(_.isInstanceOf[PartColsEntry]),
        decorate = if (dvDirs.isEmpty) identity else store.dvStamp)
      exact(if (dvDirs.isEmpty) raw else store.applyDv(table, dvDirs, raw))
    }
  }

  /** The dirs [[readEquals]] would open — the spec/monitoring probe
    * (pure driver-side manifest math). */
  private[graft] def keptDirs(store: TableStore, table: String,
      column: String, key: Long): Seq[String] =
    keptOf(store.currentEntries(table), column, Seq(key))

  private[graft] def keptDirsString(store: TableStore, table: String,
      column: String, key: String): Seq[String] =
    keptOf(store.currentEntries(table), column, Seq(key))

  /** The dirs [[readIn]] would open. */
  private[graft] def keptDirsIn(store: TableStore, table: String,
      column: String, keys: Seq[Long]): Seq[String] =
    keptOf(store.currentEntries(table), column, keys)

  /** The kept-dir filter over an already-read manifest — shared by the
    * explicit read APIs above and the transparent read-path rule
    * ([[graft.plans.AutoSkip]]), so the two probes can never drift. */
  private[graft] def keptOf(entries: Seq[ManifestEntry],
      column: String, keys: Seq[Any]): Seq[String] = {
    val props = entries.collectFirst { case PropsEntry(ps) => ps }
      .getOrElse(Map.empty)
    val dirs = entries.collect { case DataDir(d) => d }
    // corrupted size props degrade to the defaults — the same
    // conservative-fallback contract the stamp payload parse keeps
    val m = props.get(BitsProp).flatMap(v => scala.util.Try(v.toInt).toOption)
      .getOrElse(DefaultBits)
    val h = props.get(HashesProp).flatMap(v => scala.util.Try(v.toInt).toOption)
      .getOrElse(DefaultHashes)
    val posPerKey: Seq[Seq[Int]] = keys.map(keyPositions(_, m, h))
    dirs.filter(d => keepDirForKeys(props, d, column, m, posPerKey))
  }

  /** Keep `d` under a point/IN probe? All-NULL sentinel prunes, a
    * stamped filter prunes when NO key's positions are all set,
    * missing/unparseable stamps keep conservatively. */
  private[graft] def keepDirForKeys(props: Map[String, String], d: String,
      column: String, m: Int, posPerKey: Seq[Seq[Int]]): Boolean =
    props.get(statKey(d, column)) match {
      case Some(NullSentinel) => false
      case Some(b64) =>
        val bytes = try Base64.getDecoder.decode(b64)
        catch { case _: IllegalArgumentException => null }
        // unparseable stamp keeps conservatively (the zone-map rule)
        bytes == null || bytes.length * 8 < m ||
          posPerKey.exists(_.forall(p => (bytes(p >> 3) & (1 << (p & 7))) != 0))
      case None => true
    }
}
