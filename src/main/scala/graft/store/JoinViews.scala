package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incrementally-maintained JOIN views — the delta-rule complement to
  * [[MaterializedView]]'s aggregate views (classic IVM: Δ(A ⋈ B) =
  * ΔA ⋈ B ∪ A' ⋈ ΔB, Blakeley et al., SIGMOD 1986): a registered view
  * holds the materialized equi-join of two base tables and every
  * insert through a maintained front door appends exactly the join
  * DELTA — the batch probed against the other side's current content —
  * in the same atomic commit as the base write.
  *
  * Ordering makes the algebra compose inside one txn with no special
  * cases: a refresh runs AFTER its base write under read-your-writes,
  * so inserting ΔA then ΔB in one transaction adds
  * `ΔA ⋈ B_old` then `A_new ⋈ ΔB` = `ΔA⋈B_old + A_old⋈ΔB + ΔA⋈ΔB`
  * — exactly Δ(A ⋈ B), each batch counted once (JoinViewsSpec pins
  * the both-sides-one-txn schedule).
  *
  * Cost shape at 100 TB: maintaining an insert costs one equi-join of
  * the BATCH against the other base (probe-sized build side, shuffle
  * keyed like any join, broadcastable when the batch is small) plus
  * one appended dir on the view — never a view or base rescan. The
  * append-only maintenance is the point; base DELETES don't have a
  * sound row-level delta against a moved other side, so a maintained
  * delete REBUILDS the view in the same commit (correct, cost ∝ the
  * join — the documented trade, mirroring `refreshDelete`'s min/max
  * refusal in the aggregate layer).
  *
  * View schema: join keys + left non-key columns + right non-key
  * columns (disjointness validated at registration). Freshness is
  * observable, not assumed: each maintenance stamps
  * `jv.base.<table>` = that base's manifest name; [[isFresh]] compares
  * against the bases' current manifests, so a bypassing write (raw
  * txn, compaction) is detectable before trusting the view.
  */
object JoinViews {

  private val RegistryT = "mv.join.registry"

  final case class JoinDef(left: String, right: String, keys: Seq[String])

  private def baseKey(table: String) = s"jv.base.$table"

  /** Register `mvTable` as the maintained equi-join of `left` and
    * `right` on `keys`, and build it — build + registry row in ONE
    * commit. */
  def register(store: TableStore, mvTable: String, left: String,
      right: String, keys: Seq[String]): Unit = store.transaction { tx =>
    val spark = store.spark
    import spark.implicits._
    val l = tx.read(left)
    val r = tx.read(right)
    require(keys.nonEmpty && keys.forall(l.columns.contains) &&
      keys.forall(r.columns.contains),
      s"join keys ${keys.mkString(",")} must exist on both $left and $right")
    val overlap = (l.columns.toSet & r.columns.toSet) -- keys
    require(overlap.isEmpty,
      s"non-key columns must be disjoint; both sides carry ${overlap.mkString(",")}")
    writeView(tx, mvTable, left, right, l.join(r, keys))
    val row = Seq((mvTable, left, right, keys.mkString("\t")))
      .toDF("mv_table", "left_table", "right_table", "keys")
    if (tx.exists(RegistryT)) tx.insert(RegistryT, row)
    else tx.create(RegistryT, row)
  }

  private def writeView(tx: Txn, mv: String, left: String, right: String,
      df: DataFrame): Unit =
    tx.createWithExtraProps(mv, df, Map(
      baseKey(left) -> tx.manifestName(left).getOrElse(""),
      baseKey(right) -> tx.manifestName(right).getOrElse("")))

  /** Registrations touching `baseTable` (driver-side, registry-sized). */
  private def registered(tx: Txn, baseTable: String): Seq[(String, JoinDef)] =
    if (!tx.exists(RegistryT)) Seq.empty
    else tx.read(RegistryT)
      .filter(col("left_table") === baseTable || col("right_table") === baseTable)
      .collect().map(r => (r.getAs[String]("mv_table"), JoinDef(
        r.getAs[String]("left_table"), r.getAs[String]("right_table"),
        r.getAs[String]("keys").split('\t').toSeq))).toSeq

  def hasRegistered(tx: Txn, baseTable: String): Boolean =
    registered(tx, baseTable).nonEmpty

  /** Every registered join view, committed-state (driver-side,
    * registry-sized) — [[graft.plans.JvRewrite]]'s probe. */
  def registrations(store: TableStore): Seq[(String, JoinDef)] =
    if (!store.exists(RegistryT)) Seq.empty
    else store.read(RegistryT).collect().map(r =>
      (r.getAs[String]("mv_table"), JoinDef(
        r.getAs[String]("left_table"), r.getAs[String]("right_table"),
        r.getAs[String]("keys").split('\t').toSeq))).toSeq

  /** Fold an insert batch (already applied to `baseTable` in this txn)
    * into every registered join view: append `batch ⋈ other-side
    * current` — read-your-writes makes the multi-side algebra exact
    * (object doc). The view write refreshes both base watermarks. */
  def refreshRegistered(tx: Txn, baseTable: String,
      batch: DataFrame): Unit =
    registered(tx, baseTable).foreach { case (mv, d) =>
      val delta =
        if (baseTable == d.left) batch.join(tx.read(d.right), d.keys)
        else tx.read(d.left).join(batch, d.keys)
      // align to the view's column order, then append + restamp in one
      // manifest (insert, then the props rewrite, both pending)
      val cols = tx.read(mv).columns.toIndexedSeq
      val aligned = delta.select(cols.map(col): _*).localCheckpoint()
      try {
        val preMv = tx.manifestName(mv)
        tx.insert(mv, aligned)
        tx.mergeProps(mv, Map(
          baseKey(d.left) -> tx.manifestName(d.left).getOrElse(""),
          baseKey(d.right) -> tx.manifestName(d.right).getOrElse("")))
        // CHAINED IVM: aggregate views registered ON the join view fold
        // the same delta, still inside this one commit — base insert →
        // join delta → aggregate fold, each layer incremental. Runs
        // AFTER the props restamp: the agg layer's watermark must name
        // the join view's FINAL manifest of this txn, or the next fold
        // would see it diverged and rebuild every batch.
        MaterializedView.refreshRegistered(tx, mv, aligned, preMv)
      } finally aligned.unpersist()
    }

  /** A base DELETE has no sound row-level delta (the other side may
    * have moved since the doomed pairs were added): rebuild each
    * affected view from the post-delete bases in the same commit. */
  def rebuildRegistered(tx: Txn, baseTable: String): Unit =
    registered(tx, baseTable).foreach { case (mv, d) =>
      writeView(tx, mv, d.left, d.right,
        tx.read(d.left).join(tx.read(d.right), d.keys))
      // the full rewrite invalidated any chained aggregate view's
      // incremental state: a None watermark forces its self-heal
      // rebuild in the same commit
      MaterializedView.refreshRegistered(tx, mv, tx.read(mv).limit(0), None)
    }

  /** Do the view's stamped base watermarks match the bases' CURRENT
    * manifests? False means some write bypassed maintenance (or a
    * compaction moved a base) — re-register or rebuild before trusting
    * the view. */
  def isFresh(store: TableStore, mvTable: String): Boolean = {
    val reg =
      if (!store.exists(RegistryT)) Seq.empty
      else store.read(RegistryT).filter(col("mv_table") === mvTable)
        .collect().map(r => JoinDef(r.getAs[String]("left_table"),
          r.getAs[String]("right_table"),
          r.getAs[String]("keys").split('\t').toSeq)).toSeq
    reg.headOption.exists { d =>
      val props = store.tableProps(mvTable)
      Seq(d.left, d.right).forall(b =>
        props.get(baseKey(b)).exists(w =>
          store.currentManifestName(b).contains(w)))
    }
  }
}
