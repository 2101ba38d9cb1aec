package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Slowly-changing-dimension (type 2) maintenance over a store table —
  * the warehouse-canonical "keep every version with validity
  * intervals" mutation (Kimball's SCD2), built on the store's
  * copy-on-write primitives the way the reference composes its logged
  * operations into higher mutations (`Kernel/README.md:251-254` — a
  * transaction is a queued batch applied atomically; an SCD batch is
  * exactly such a unit: close + append in one commit).
  *
  * Table shape: business key columns + attribute columns +
  * `valid_from` (BIGINT event micros), `valid_to` (BIGINT, NULL =
  * open), `is_current` (BOOLEAN). Invariants: per key, intervals are
  * disjoint and cover [first valid_from, ∞); exactly one open row per
  * key; a new version opens iff some attribute actually changed
  * (no-change rows cause zero churn).
  *
  * Scale shape: one batch apply costs (a) the batch×current-version
  * compare — an equi-join on the key, batch-bounded; (b) a file-level
  * COW of only the dirs holding a closing row ([[Txn.rewriteMatched]]
  * — touched fraction, never table size); (c) one appended dir with
  * the new versions. History accumulates append-only, exactly the
  * shape the store's manifest log is built for.
  */
object Scd2 {

  private val From = "valid_from"
  private val To = "valid_to"
  private val Cur = "is_current"
  val MetaCols: Seq[String] = Seq(From, To, Cur)

  /** Seed the dimension: every batch row becomes an open version
    * effective at `effMicros`. */
  def init(store: TableStore, table: String, batch: DataFrame,
      effMicros: Long): Unit =
    store.create(table, stamped(batch, effMicros))

  private def stamped(batch: DataFrame, effMicros: Long): DataFrame =
    batch
      .withColumn(From, lit(effMicros))
      .withColumn(To, lit(null).cast(LongType))
      .withColumn(Cur, lit(true))

  /** Apply one dimension snapshot effective at `effMicros`: keys whose
    * attributes changed (or are new) get their open version closed at
    * `effMicros` and a fresh open version appended; unchanged keys are
    * untouched — the whole batch lands in ONE atomic commit. Rows for
    * keys absent from the batch keep their open version (a snapshot
    * covers the keys it mentions). */
  def applyBatch(store: TableStore, table: String, batch: DataFrame,
      keys: Seq[String], effMicros: Long): Unit = store.transaction { tx =>
    val pinned = batch.localCheckpoint()
    try {
      val attrs = pinned.columns.filterNot(keys.contains).toSeq
      require(attrs.nonEmpty, "an SCD2 batch needs at least one attribute column")
      // a snapshot must carry exactly one row per business key —
      // duplicates would append multiple OPEN versions for the same
      // key, silently breaking the one-open-row-per-key invariant
      // (same admission guard as Txn.merge's batch-unique check)
      val dupKeys = pinned.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).count()
      require(dupKeys == 0,
        s"SCD2 snapshot for $table carries $dupKeys duplicated business " +
          s"key(s) on (${keys.mkString(", ")}) — one row per key per snapshot")
      val current = tx.read(table).filter(col(Cur))
        .select(keys.map(col) ++ attrs.map(a => col(a).as(s"__c_$a")) :+
          lit(true).as("__exists"): _*)
      // changed = new key, or any attribute not null-safe-equal to the
      // open version's value
      val changed = pinned.join(current, keys, "left")
        .filter(col("__exists").isNull ||
          attrs.map(a => !(col(a) <=> col(s"__c_$a"))).reduce(_ || _))
        .select(pinned.columns.map(col).toIndexedSeq: _*)
        .localCheckpoint()
      try {
        // an all-unchanged snapshot is a TRUE no-op: without this gate
        // the rewrite would still append an empty dir and a manifest
        // line per snapshot — churn the zero-churn invariant forbids
        if (changed.take(1).nonEmpty) {
          val changedKeys = changed.select(keys.map(col): _*).distinct()
          def close(df: DataFrame): DataFrame = {
            val marked = df.join(changedKeys.withColumn("__hit", lit(true)),
              keys, "left")
            val closing = col("__hit") && coalesce(col(Cur), lit(false))
            marked.select(df.columns.map {
              case To => when(closing, lit(effMicros)).otherwise(col(To)).as(To)
              case Cur => when(closing, lit(false)).otherwise(col(Cur)).as(Cur)
              case c => col(c)
            }.toIndexedSeq: _*)
          }
          tx.rewriteMatched(table,
            hits = df => df.filter(col(Cur)).join(changedKeys, keys, "left_semi"),
            rewrite = close,
            appended = Some(stamped(changed, effMicros)))
        }
      } finally changed.unpersist()
    } finally pinned.unpersist()
  }

  /** The dimension AS OF `atMicros`: the version whose interval covers
    * the instant — a filter, not a join, because intervals are
    * disjoint by construction. */
  def asOf(store: TableStore, table: String, atMicros: Long): DataFrame =
    store.read(table).filter(col(From) <= atMicros &&
      (col(To).isNull || col(To) > atMicros))
}
