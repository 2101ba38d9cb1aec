package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance over [[TableStore]] tables
  * — the counting algorithm of the IVM literature (Gupta/Mumick,
  * "Maintenance of Materialized Views: Problems, Techniques, and
  * Applications", IEEE DE Bulletin 1995) applied to distributive
  * aggregates, which is the reference's cached-query design
  * (`Kernel/README.md:142-161`: a query result materialized and kept
  * consistent under updates) taken to its incremental conclusion: the
  * memo is not just cached, it is MAINTAINED under inserts and deletes
  * without ever re-reading the base relation.
  *
  * The view is `SELECT keys, count(*), SUM(e_i) GROUP BY keys` where
  * every `e_i` is an exact BIGINT expression (counts, integral
  * quantities, fixed-point cents — the repo's accumulation-order-free
  * convention). Exactness is what makes incremental maintenance SOUND:
  * integer partials merge associatively and deletes subtract exactly,
  * so any interleaving of build/refresh batches lands on the identical
  * fixed point a full recompute produces — a float sum would drift by
  * merge order and the MV would diverge from its definition one ulp at
  * a time.
  *
  * Scale shape (the whole point at 100 TB): `build` scans the base
  * once; every `refresh` aggregates ONLY its delta batch (cost ∝ batch,
  * partial aggregation applies) and merges with the MV, whose size is
  * the number of GROUPS, not rows. The base relation is not an input to
  * `refresh` at all — the API makes a base rescan impossible, not just
  * avoided (MatViewSpec proves it by deleting the base files between
  * build and refresh). Each refresh lands as one atomic store commit, so
  * readers always see a consistent MV version and time travel across
  * refreshes works like any other table.
  */
object MaterializedView {

  /** View definition: group keys + named exact-BIGINT sum expressions,
    * plus optional MIN/MAX expressions and optional KMV SKETCH columns
    * (`kmvs`: a name and the BIGINT hash expression to sketch — the
    * stored column is the ascending ≤ kmvK-long array of minimum
    * distinct hashes, giving the view an incrementally-maintained
    * approximate DISTINCT count per group without ever re-scanning
    * history; deterministic order statistics, so exact-below-k and
    * oracle-checkable). The MV schema is
    * `keys ++ (n_rows BIGINT) ++ sums ++ mins ++ maxs ++ kmvs` by name.
    * Sketches maintain under INSERTS only, like min/max.
    *
    * Sums and counts are SELF-MAINTAINABLE under both inserts and
    * deletes (they form a group under addition). Min/max are
    * maintainable under INSERTS only — `min(a ∪ b) = min(min a, min b)`
    * — but not under deletes: removing the current minimum requires
    * rescanning the group's remaining rows to find the runner-up, the
    * textbook non-self-maintainability result (Gupta/Mumick 1995).
    * [[refreshDelete]] therefore REJECTS a spec with min/max columns
    * loudly instead of silently corrupting the view. */
  final case class MvSpec(keys: Seq[String], sums: Seq[(String, Column)],
      mins: Seq[(String, Column)] = Nil, maxs: Seq[(String, Column)] = Nil,
      kmvs: Seq[(String, Column)] = Nil, kmvK: Int = 256)

  /** A REGISTERABLE view definition: sums as SQL text so the
    * definition can live in the store's registry table and be
    * replanned by any later session ([[register]]/[[insertInto]]). */
  final case class MvDef(keys: Seq[String], sums: Seq[(String, String)]) {
    require((keys ++ sums.flatMap(s => Seq(s._1, s._2)))
      .forall(!_.contains("\t")), "mv definition fields must not contain tabs")
    def spec: MvSpec = MvSpec(keys, sums.map { case (n, e) => (n, expr(e)) })
  }

  /** The view's aggregate applied to any slice of the base relation —
    * the ONE definition build, refresh, and the spec's recompute all
    * share (a second copy could drift from the maintained one). */
  def aggregate(rows: DataFrame, spec: MvSpec): DataFrame =
    rows.groupBy(spec.keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        (spec.sums.map { case (n, e) => sum(e).as(n) } ++
          spec.mins.map { case (n, e) => min(e).as(n) } ++
          spec.maxs.map { case (n, e) => max(e).as(n) } ++
          spec.kmvs.map { case (n, e) =>
            udaf(new graft.functions.KmvValuesAgg(spec.kmvK)).apply(e).as(n) }): _*)

  /** Group-wise fold of MV rows with delta-aggregate rows — the ONE
    * merge all refresh paths share: sums/counts add, mins/maxs fold
    * through their own operation, emptied groups leave. */
  private def remerge(unioned: DataFrame, spec: MvSpec): DataFrame =
    unioned.groupBy(spec.keys.map(col): _*)
      .agg(sum("n_rows").as("n_rows"),
        (spec.sums.map { case (n, _) => sum(col(n)).as(n) } ++
          spec.mins.map { case (n, _) => min(col(n)).as(n) } ++
          spec.maxs.map { case (n, _) => max(col(n)).as(n) } ++
          // KMV mergeability as pure array algebra: the k smallest
          // distinct hashes of the union of the operand sketches IS
          // the sketch of the union (Beyer et al. 2007) — the merge
          // never rescans the base, exactly like the sum columns
          spec.kmvs.map { case (n, _) =>
            slice(array_sort(array_distinct(flatten(collect_list(col(n))))),
              1, spec.kmvK).as(n) }): _*)
      .filter(col("n_rows") > 0)

  /** One-time full build: the only scan of the base this MV ever does. */
  def build(store: TableStore, table: String, base: DataFrame,
      spec: MvSpec): Unit =
    store.create(table, aggregate(base, spec))

  /** Apply an INSERT delta: aggregate the batch (cost ∝ batch), then
    * merge group-wise with the MV — a groupBy over (#groups + #batch
    * groups) rows, never the base. New groups appear with their batch
    * totals; existing groups add exactly. One atomic commit.
    *
    * `batchId` makes the refresh EXACTLY-ONCE for streaming callers
    * (the st7 mark protocol): the MV replace and the batch-id mark
    * land in ONE store commit, and a replayed batch — its id at or
    * below the committed mark — is skipped whole. A refresh is
    * additive, so replaying it unmarked would double-count; the mark
    * is what lets `foreachBatch` drive MV maintenance safely. */
  def refreshInsert(store: TableStore, table: String, delta: DataFrame,
      spec: MvSpec, batchId: Option[Long] = None): Unit =
    merge(store, table, aggregate(delta, spec), spec, batchId)

  /** Apply a DELETE delta (the rows REMOVED from the base): the same
    * merge with every partial negated — counts and exact sums subtract
    * — and groups whose count reaches zero leave the view (the counting
    * algorithm's group-liveness rule; a float sum could not do this —
    * "reaches zero" would be "reaches epsilon"). The caller contract is
    * the usual IVM one: the delta is exactly the multiset of removed
    * rows. */
  def refreshDelete(store: TableStore, table: String, delta: DataFrame,
      spec: MvSpec): Unit = {
    require(spec.mins.isEmpty && spec.maxs.isEmpty,
      "min/max are not self-maintainable under deletes (removing the " +
        "extremum needs a group rescan) — rebuild the view or drop the " +
        "min/max columns from the spec")
    require(spec.kmvs.isEmpty,
      "KMV sketches are not self-maintainable under deletes (a sketch " +
        "of a set minus rows is not derivable from the sketch) — " +
        "rebuild the view or drop the sketch columns from the spec")
    merge(store, table, negatedAggregate(delta, spec), spec)
  }

  /** The delta aggregate with every partial negated — counts and exact
    * sums subtract (the counting algorithm's delete side; sound ONLY
    * because registered partials are exact BIGINTs). */
  private def negatedAggregate(delta: DataFrame, spec: MvSpec): DataFrame = {
    val neg = aggregate(delta, spec).withColumn("n_rows", -col("n_rows"))
    spec.sums.foldLeft(neg) { case (df, (n, _)) => df.withColumn(n, -col(n)) }
  }

  /** The store's view registry: one row per registered MV (view table,
    * base table, tab-joined keys / sum names / sum SQL). A plain store
    * table, so registration is itself a versioned commit. */
  private val RegistryT = "mv.registry"

  /** View prop naming the BASE manifest the view was last maintained
    * against — [[graft.plans.MvRewrite]]'s staleness fence. A table's
    * manifest name moves on EVERY committed write, so any base write
    * that bypassed maintenance (a raw `transaction { tx => ... }`,
    * compaction, migrate) breaks the match and the rewrite degrades to
    * the always-correct base scan instead of serving a stale view. */
  val BaseManifestProp = "graft.mv.base.manifest"

  /** Write (or rewrite) view `mv` stamped with the base's
    * manifest-name watermark under this txn's read-your-writes view —
    * called AFTER the base write in a maintenance txn, so the stamp
    * names the manifest being committed alongside the view. */
  private def writeView(tx: Txn, mv: String, baseTable: String,
      df: DataFrame): Unit =
    tx.createWithExtraProps(mv, df,
      Map(BaseManifestProp -> tx.manifestName(baseTable).getOrElse("")))

  /** Was `mv` maintained against exactly the base manifest the caller
    * just wrote OVER (`syncedTo` = the base's pre-write manifest)? An
    * incremental fold is sound only then — folding a delta into a view
    * that already missed a bypassed write would stamp a fresh watermark
    * onto wrong contents and re-arm the rewrite on a lie. */
  private def viewInSync(tx: Txn, mv: String,
      syncedTo: Option[String]): Boolean =
    tx.props(mv).get(BaseManifestProp).exists(w => syncedTo.contains(w))

  /** Self-heal a diverged view: one full re-aggregate of the
    * POST-write base — the only sound state to restamp from. Costs a
    * base scan, but only on the first maintained write after a
    * bypassing one (raw txn, compaction, migrate); every later write
    * folds incrementally again. */
  private def rebuild(tx: Txn, mv: String, baseTable: String,
      spec: MvSpec): Unit =
    writeView(tx, mv, baseTable,
      aggregate(tx.read(baseTable), spec).localCheckpoint())

  /** Register `mvTable` as a maintained view over `baseTable` and build
    * it — view build + registry row in ONE commit. From then on,
    * [[insertInto]] on the base keeps the view consistent. */
  def register(store: TableStore, mvTable: String, baseTable: String,
      dfn: MvDef): Unit = store.transaction { tx =>
    val spark = store.spark
    import spark.implicits._
    writeView(tx, mvTable, baseTable, aggregate(tx.read(baseTable), dfn.spec))
    val row = Seq((mvTable, baseTable, dfn.keys.mkString("\t"),
      dfn.sums.map(_._1).mkString("\t"), dfn.sums.map(_._2).mkString("\t")))
      .toDF("mv_table", "base_table", "keys", "sum_names", "sum_exprs")
    if (tx.exists(RegistryT)) tx.insert(RegistryT, row)
    else tx.create(RegistryT, row)
  }

  /** The registered views over `baseTable` — a driver-side collect
    * bounded by the number of REGISTERED VIEWS, never by data. */
  private def registered(read: String => DataFrame,
      exists: String => Boolean, baseTable: String): Seq[(String, MvDef)] =
    if (!exists(RegistryT)) Seq.empty
    else read(RegistryT).filter(col("base_table") === baseTable).collect()
      .map(r => (r.getAs[String]("mv_table"), rowDef(r))).toSeq

  private def rowDef(r: org.apache.spark.sql.Row): MvDef = MvDef(
    r.getAs[String]("keys").split('\t').toSeq,
    r.getAs[String]("sum_names").split('\t').toSeq
      .zip(r.getAs[String]("sum_exprs").split('\t').toSeq))

  /** Every registration in the store — (view table, base table,
    * definition); the matching surface of [[graft.plans.MvRewrite]]. */
  def registrations(store: TableStore): Seq[(String, String, MvDef)] =
    if (!store.exists(RegistryT)) Seq.empty
    else store.read(RegistryT).collect().map(r =>
      (r.getAs[String]("mv_table"), r.getAs[String]("base_table"),
        rowDef(r))).toSeq

  /** Insert into a base table WITH its registered views maintained —
    * base append plus every view's incremental refresh in ONE atomic
    * commit, so no reader ever observes the base and a view out of
    * sync, and time travel pairs base version k with view version k
    * (MatViewSpec pins both). Per view the added cost is the batch
    * aggregate + a #groups merge — the base history is never
    * re-aggregated. Routed through [[WritePath.insert]], so declared
    * CHECK/UNIQUE/FK constraints also gate the batch. */
  def insertInto(store: TableStore, baseTable: String,
      rows: DataFrame): Unit =
    store.transaction(WritePath.insert(_, baseTable, rows))

  /** Fold `rows` (an insert batch already applied to `baseTable` in
    * this txn) into every view registered over it — the txn-level
    * primitive [[insertInto]] and the HeroQL `@insert` path share, so
    * ANY insert route keeps registered views consistent in the same
    * atomic commit. */
  def refreshRegistered(tx: Txn, baseTable: String, rows: DataFrame,
      syncedTo: Option[String]): Unit =
    registered(tx.read, tx.exists, baseTable).foreach { case (mv, dfn) =>
      val spec = dfn.spec
      if (viewInSync(tx, mv, syncedTo)) {
        val merged = remerge(
          tx.read(mv).unionByName(aggregate(rows, spec)), spec)
        writeView(tx, mv, baseTable, merged.localCheckpoint())
      } else rebuild(tx, mv, baseTable, spec)
    }

  /** Whether any view is registered over `baseTable` — what lets the
    * delete/update mutation paths skip the removed-row capture (an
    * extra matched-set plan) entirely when no view needs it. */
  def hasRegistered(tx: Txn, baseTable: String): Boolean =
    registered(tx.read, tx.exists, baseTable).nonEmpty

  /** Fold a DELETE delta (the exact multiset of rows REMOVED from
    * `baseTable` in this txn) into every registered view — negated
    * partials, emptied groups leave (group liveness via `n_rows`).
    * Registered [[MvDef]]s are sums-only by construction, so delete
    * maintenance is always sound here (no min/max rescan hazard) —
    * what makes the HeroQL `@remove`/`@update` paths maintainable
    * instead of silently staling the view. */
  def refreshRegisteredDelete(tx: Txn, baseTable: String,
      removed: DataFrame, syncedTo: Option[String]): Unit =
    registered(tx.read, tx.exists, baseTable).foreach { case (mv, dfn) =>
      val spec = dfn.spec
      if (viewInSync(tx, mv, syncedTo)) {
        val merged = remerge(
          tx.read(mv).unionByName(negatedAggregate(removed, spec)), spec)
        writeView(tx, mv, baseTable, merged.localCheckpoint())
      } else rebuild(tx, mv, baseTable, spec)
    }

  /** UPDATE-shaped maintenance: the matched pre-state rows leave, their
    * rewritten versions enter — ONE fold per view (a delete-fold then
    * insert-fold pair could not self-heal correctly: a rebuild on the
    * delete side would already include the added rows, and the second
    * fold would double-count them). */
  def refreshRegisteredUpdate(tx: Txn, baseTable: String,
      removed: DataFrame, added: DataFrame,
      syncedTo: Option[String]): Unit =
    registered(tx.read, tx.exists, baseTable).foreach { case (mv, dfn) =>
      val spec = dfn.spec
      if (viewInSync(tx, mv, syncedTo)) {
        val merged = remerge(tx.read(mv)
          .unionByName(negatedAggregate(removed, spec))
          .unionByName(aggregate(added, spec)), spec)
        writeView(tx, mv, baseTable, merged.localCheckpoint())
      } else rebuild(tx, mv, baseTable, spec)
    }

  private def merge(store: TableStore, table: String, deltaAgg: DataFrame,
      spec: MvSpec, batchId: Option[Long] = None): Unit = {
    val markT = table + "__mark"
    val replayed = batchId.exists(b =>
      store.exists(markT) && store.read(markT).head().getLong(0) >= b)
    if (replayed) return // already folded into the committed MV
    // a refresh against a not-yet-built MV folds into an empty one —
    // what lets streaming callers mark their FIRST batch too (a
    // markless build followed by a batch-0 replay would double-count)
    val cur =
      if (store.exists(table)) store.read(table)
      else {
        val spark = deltaAgg.sparkSession
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], deltaAgg.schema)
      }
    val merged = remerge(cur.unionByName(deltaAgg), spec)
    // localCheckpoint before the commit: the merged plan reads the MV
    // table's CURRENT files, and create() replaces them — materialize
    // the result first so the write never races its own input
    val pinned = merged.localCheckpoint()
    batchId match {
      case None => store.create(table, pinned)
      case Some(b) =>
        val spark = pinned.sparkSession
        val mark = spark.range(1).select(lit(b).as("batch_id"))
        // MV replace + mark in ONE atomic commit: a crash between the
        // two would otherwise let a replay double-apply the batch
        store.transaction { tx =>
          tx.create(table, pinned)
          tx.create(markT, mark)
        }
    }
  }
}
