package graft.store

import org.apache.spark.sql.DataFrame

/** THE txn-level insert primitive — every insert front door (the store
  * API's constraint-checked insert, [[MaterializedView.insertInto]],
  * the HeroQL `@insert` path) funnels through here, so declared
  * constraints and registered-view maintenance BOTH run no matter
  * which route a batch arrives by. The reference treats writes as one
  * logged operation stream (`Kernel/Source/Utility/Log.h:157-184` —
  * one WAL, not one per feature); two front doors each enforcing only
  * their own feature would be the split that design forbids.
  *
  * Order inside the txn: validate the pinned batch against every
  * declared constraint (a violation aborts — nothing commits), append
  * it to the base, fold it into every registered view. All three land
  * in ONE atomic store commit; no reader ever observes a base/view
  * pair out of sync or a constraint-violating row.
  */
object WritePath {

  /** Insert `rows` into `table` with full admission control and view
    * maintenance. Returns the pinned batch (the exact rows validated
    * AND written — callers composing further actions reuse it instead
    * of re-evaluating a possibly nondeterministic source).
    *
    * @param alreadyPinned the caller has localCheckpoint'ed `rows`
    *                      itself (skips a redundant second pin) */
  def insert(tx: Txn, table: String, rows: DataFrame,
      alreadyPinned: Boolean = false): DataFrame = {
    // the base's PRE-write manifest: the sync point the registered
    // views must have been maintained against for an incremental fold
    // to be sound (else they self-heal with a rebuild)
    val pre = tx.manifestName(table)
    val pinned = if (alreadyPinned) rows else rows.localCheckpoint()
    CheckConstraints.validate(tx, table, pinned)
    tx.insert(table, pinned)
    // the batch passed admission against exactly (pre, current refs):
    // advance the constraint validity chain in the same commit
    CheckConstraints.advanceAfterInsert(tx, table, pre)
    MaterializedView.refreshRegistered(tx, table, pinned, pre)
    JoinViews.refreshRegistered(tx, table, pinned)
    pinned
  }
}
