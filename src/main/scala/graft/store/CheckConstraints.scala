package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CHECK constraints enforced at the store's write path — the
  * reference's declared-schema stance (`data` declarations with typed,
  * constrained fields: enums `Kernel/README.md:31-34`, `where` clauses
  * on rules `Kernel/Drafts/draft:116`, cardinality-checked
  * relationships `Kernel/Drafts/draft_students:23-24`) applied as
  * admission control: a batch that violates a declared predicate is
  * rejected WHOLE before anything commits, with the violation count in
  * the error — not discovered later by a validation query (g5's
  * after-the-fact form).
  *
  * Constraints live in a per-store registry table (`check.registry`),
  * so they are themselves versioned commits and visible to any later
  * session. Validation cost is one aggregate over the INCOMING batch
  * per constraint — map-only, ∝ batch, never a scan of the table;
  * declaring a constraint validates the existing rows once (a check
  * that does not hold at declaration time would be a lie).
  */
object CheckConstraints {

  final class CheckViolation(val table: String, val constraint: String,
      val violations: Long) extends RuntimeException(
    s"check constraint '$constraint' on '$table' rejected the batch: " +
      s"$violations violating row(s)")

  private val RegistryT = "check.registry"

  /** Declare `predicateSql` (a boolean SQL expression over the table's
    * columns) as constraint `name` on `table`. The EXISTING rows must
    * satisfy it; the declaration is one registry commit. */
  def declare(store: TableStore, table: String, name: String,
      predicateSql: String): Unit = store.transaction { tx =>
    val spark = store.spark
    import spark.implicits._
    val bad = tx.read(table).filter(not(expr(predicateSql))).count()
    if (bad > 0) throw new CheckViolation(table, name, bad)
    val row = Seq((table, name, predicateSql))
      .toDF("base_table", "constraint_name", "predicate")
    if (tx.exists(RegistryT)) tx.insert(RegistryT, row)
    else tx.create(RegistryT, row)
  }

  /** The constraints declared on `table` — a driver-side collect
    * bounded by the number of DECLARED CONSTRAINTS, never by data. */
  private def declared(tx: Txn, table: String): Seq[(String, String)] =
    if (!tx.exists(RegistryT)) Seq.empty
    else tx.read(RegistryT).filter(col("base_table") === table).collect()
      .map(r => (r.getAs[String]("constraint_name"),
        r.getAs[String]("predicate"))).toSeq

  /** Insert `rows` into `table` iff every declared constraint holds on
    * the batch; the first violated constraint aborts the transaction —
    * nothing commits, the table is untouched (the spec pins commit
    * count and content across a rejection). */
  def insert(store: TableStore, table: String, rows: DataFrame): Unit =
    store.transaction { tx =>
      // pin the batch once: each constraint aggregates it, and the
      // admitted insert writes it — recomputing a nondeterministic
      // source per pass could validate one batch and commit another
      val pinned = rows.localCheckpoint()
      declared(tx, table).foreach { case (name, pred) =>
        val bad = pinned.filter(not(expr(pred))).count()
        if (bad > 0) throw new CheckViolation(table, name, bad)
      }
      tx.insert(table, pinned)
    }
}
