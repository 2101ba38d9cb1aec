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

  /** Validity-watermark memo table: one row per constraint,
    * (constraint_name, manifest, ref_manifest) — the base table's (and
    * for FKs the referenced table's) manifest names the constraint was
    * last PROVEN against. The chain invariant mirrors [[MaterializedView]]
    * freshness: a watermark advances ONLY from a state it already
    * covers, through a validated write in the same commit — so
    * `memo == current manifest` certifies that every commit since the
    * last full validation went through admission control. A write that
    * bypasses validation (raw txn insert, compaction is fine — no rows
    * change — but migrate/update are not advanced here) breaks the
    * chain: the constraint still *exists*, but consumers that need a
    * PROOF (the FK join-elimination rule) stand down until
    * [[revalidate]] re-checks the whole table. */
  private val ValidT = "check.validity"

  private def memos(tx: Txn): Map[String, (String, String)] =
    if (!tx.exists(ValidT)) Map.empty
    else tx.read(ValidT).collect().map(r =>
      r.getAs[String]("constraint_name") ->
        ((r.getAs[String]("manifest"), r.getAs[String]("ref_manifest")))).toMap

  private def writeMemos(tx: Txn,
      m: Map[String, (String, String)]): Unit = {
    val spark = tx.read(RegistryT).sparkSession
    import spark.implicits._
    tx.create(ValidT, m.toSeq.map { case (n, (a, b)) => (n, a, b) }
      .toDF("constraint_name", "manifest", "ref_manifest"))
  }

  private def stamp(tx: Txn, name: String, manifest: String,
      refManifest: String): Unit =
    writeMemos(tx, memos(tx) + (name -> ((manifest, refManifest))))

  private def registerRow(tx: Txn, table: String, name: String,
      kind: String, detail: String): Unit = {
    val spark = tx.read(table).sparkSession
    import spark.implicits._
    val row = Seq((table, name, kind, detail))
      .toDF("base_table", "constraint_name", "kind", "detail")
    if (tx.exists(RegistryT)) tx.insert(RegistryT, row)
    else tx.create(RegistryT, row)
  }

  /** Declare `predicateSql` (a boolean SQL expression over the table's
    * columns) as constraint `name` on `table`. The EXISTING rows must
    * satisfy it; the declaration is one registry commit. */
  def declare(store: TableStore, table: String, name: String,
      predicateSql: String): Unit = store.transaction { tx =>
    val bad = tx.read(table).filter(not(expr(predicateSql))).count()
    if (bad > 0) throw new CheckViolation(table, name, bad)
    registerRow(tx, table, name, "check", predicateSql)
    stamp(tx, name, tx.manifestName(table).getOrElse(""), "")
  }

  /** Declare a UNIQUE key over `keyCols` (the reference's `Unique`
    * index kind, `Kernel/README.md:64-74`, enforced at admission
    * instead of by a separate index structure). Existing duplicates
    * reject the declaration. */
  def declareUnique(store: TableStore, table: String, name: String,
      keyCols: Seq[String]): Unit = store.transaction { tx =>
    val dup = tx.read(table).groupBy(keyCols.map(col): _*)
      .count().filter(col("count") > 1).count()
    if (dup > 0) throw new CheckViolation(table, name, dup)
    registerRow(tx, table, name, "unique", keyCols.mkString("\t"))
    stamp(tx, name, tx.manifestName(table).getOrElse(""), "")
  }

  /** Declare a FOREIGN KEY: every `keyCols` tuple must exist as a
    * `refCols` tuple of `refTable` (the reference's relationship
    * fields with enforced endpoints, `Kernel/Drafts/draft:36-38`).
    * Existing orphans reject the declaration. */
  def declareForeignKey(store: TableStore, table: String, name: String,
      keyCols: Seq[String], refTable: String, refCols: Seq[String]): Unit =
    store.transaction { tx =>
      require(keyCols.size == refCols.size, "fk column arity mismatch")
      val orphans = fkOrphans(tx.read(table), tx.read(refTable), keyCols, refCols)
      if (orphans > 0) throw new CheckViolation(table, name, orphans)
      registerRow(tx, table, name, "fk",
        (keyCols :+ refTable) .mkString("\t") + "\u0000" + refCols.mkString("\t"))
      stamp(tx, name, tx.manifestName(table).getOrElse(""),
        tx.manifestName(refTable).getOrElse(""))
    }

  private def fkOrphans(rows: DataFrame, ref: DataFrame,
      keyCols: Seq[String], refCols: Seq[String]): Long = {
    val cond = keyCols.zip(refCols).map { case (k, r) =>
      rows(k) === ref(r)
    }.reduce(_ && _)
    rows.join(ref, cond, "left_anti").count()
  }

  /** The constraints declared on `table` — a driver-side collect
    * bounded by the number of DECLARED CONSTRAINTS, never by data. */
  private def declared(tx: Txn, table: String): Seq[(String, String, String)] =
    if (!tx.exists(RegistryT)) Seq.empty
    else tx.read(RegistryT).filter(col("base_table") === table).collect()
      .map(r => (r.getAs[String]("constraint_name"),
        r.getAs[String]("kind"), r.getAs[String]("detail"))).toSeq

  /** Insert `rows` into `table` iff every declared constraint holds;
    * the first violated constraint aborts the transaction — nothing
    * commits, the table is untouched (the spec pins commit count and
    * content across a rejection). Per-constraint batch cost:
    * `check` is one map-only aggregate over the batch; `unique` is a
    * batch-internal dup count plus a batch⋈table key semi-join (the
    * probe side is the BATCH — at a bucketed layout the table side
    * prunes to the batch's buckets, the st5b shape); `fk` is a
    * batch⋈ref anti-join on the key (broadcast at dimension ratios). */
  def insert(store: TableStore, table: String, rows: DataFrame): Unit =
    store.transaction(WritePath.insert(_, table, rows))

  /** Validate an already-pinned batch against every constraint
    * declared on `table` — the txn-level half all insert front doors
    * share via [[WritePath.insert]]. The caller pins the batch once:
    * each constraint aggregates it, and the admitted insert writes it —
    * recomputing a nondeterministic source per pass could validate one
    * batch and commit another. */
  def validate(tx: Txn, table: String, pinned: DataFrame): Unit =
      declared(tx, table).foreach {
        case (name, "check", pred) =>
          val bad = pinned.filter(not(expr(pred))).count()
          if (bad > 0) throw new CheckViolation(table, name, bad)
        case (name, "unique", detail) =>
          val keys = detail.split('\t').toSeq
          val dupIn = pinned.groupBy(keys.map(col): _*)
            .count().filter(col("count") > 1).count()
          if (dupIn > 0) throw new CheckViolation(table, name, dupIn)
          val cur = tx.read(table).select(keys.map(col): _*)
          val clash = pinned.join(cur, keys, "left_semi").count()
          if (clash > 0) throw new CheckViolation(table, name, clash)
        case (name, "fk", detail) =>
          val Array(left, right) = detail.split('\u0000')
          val leftParts = left.split('\t').toSeq
          val (keys, refTable) = (leftParts.init, leftParts.last)
          val refCols = right.split('\t').toSeq
          val orphans = fkOrphans(pinned, tx.read(refTable), keys, refCols)
          if (orphans > 0) throw new CheckViolation(table, name, orphans)
        case (name, kind, _) => throw new IllegalStateException(
          s"unknown constraint kind '$kind' for '$name'")
      }

  private def parseFk(detail: String): (Seq[String], String, Seq[String]) = {
    val Array(left, right) = detail.split('\u0000')
    val lp = left.split('\t').toSeq
    (lp.init, lp.last, right.split('\t').toSeq)
  }

  /** Every declared FK store-wide: (name, factTable, fkCols, refTable,
    * refCols). Driver collect bounded by declared constraints. */
  private def fkRows(tx: Txn): Seq[(String, String, Seq[String], String, Seq[String])] =
    if (!tx.exists(RegistryT)) Seq.empty
    else tx.read(RegistryT).filter(col("kind") === "fk").collect().map { r =>
      val (keys, refTable, refCols) = parseFk(r.getAs[String]("detail"))
      (r.getAs[String]("constraint_name"), r.getAs[String]("base_table"),
        keys, refTable, refCols)
    }.toSeq

  /** Advance validity watermarks after a VALIDATED insert into `table`
    * (called by [[WritePath.insert]] after the rows land, same commit).
    * A memo only moves from a state it already covers:
    *  - constraints ON `table` advance `pre → post` (for FKs, only if
    *    the referenced table ALSO still matches — the batch was checked
    *    against that exact ref state);
    *  - FKs REFERENCING `table` advance their ref watermark — adding
    *    rows to the referenced side can never orphan a fact row.
    * Anything that doesn't match stays put: the chain is broken and
    * only [[revalidate]]'s full re-check can mend it. */
  def advanceAfterInsert(tx: Txn, table: String, pre: Option[String]): Unit = {
    if (!tx.exists(RegistryT)) return
    val post = tx.manifestName(table).getOrElse("")
    val preM = pre.getOrElse("")
    val mem = memos(tx)
    var next = mem
    declared(tx, table).foreach { case (name, kind, detail) =>
      mem.get(name).foreach { case (m, rm) =>
        kind match {
          case "fk" =>
            val (_, refTable, _) = parseFk(detail)
            if (m == preM && rm == tx.manifestName(refTable).getOrElse(""))
              next += name -> ((post, rm))
          case _ =>
            if (m == preM) next += name -> ((post, rm))
        }
      }
    }
    fkRows(tx).foreach { case (name, factTable, _, refTable, _) =>
      if (refTable == table) mem.get(name).foreach { case (m, rm) =>
        if (rm == preM && m == tx.manifestName(factTable).getOrElse(""))
          next += name -> ((m, post))
      }
    }
    if (next != mem) writeMemos(tx, next)
  }

  /** Referential RESTRICT for the delete path: refuse to remove rows
    * from a table that other tables' declared FKs still reference.
    * For each FK whose referenced side is `table`, the keys about to
    * DISAPPEAR — matched by the delete AND carried by no surviving row
    * (set-level, matching [[validateUpdate]]'s stillThere check: a
    * non-unique referenced table keeps a key alive as long as any
    * carrier survives) — are semi-joined against the referencing
    * table; any hit rejects the whole delete (cost: one keyed
    * anti-join + semi-join per referencing FK, probe side = the
    * removed keys). The complement of [[validate]]'s orphan check on
    * inserts: together they make a declared FK unbreakable through
    * the checked front doors. */
  def restrictDelete(tx: Txn, table: String,
      cond: org.apache.spark.sql.Column): Unit =
    fkRows(tx).foreach { case (name, factTable, keys, refTable, refCols) =>
      if (refTable == table && tx.exists(factTable)) {
        val rows = tx.read(table)
        val matched = rows.filter(coalesce(cond, lit(false)))
          .select(refCols.map(col): _*).distinct()
        val surviving = rows.filter(!coalesce(cond, lit(false)))
          .select(refCols.map(col): _*)
        val removedKeys = matched.join(surviving, refCols.toSeq, "left_anti")
        checkNotReferenced(tx, table, name, factTable, keys, refCols,
          removedKeys)
      }
    }

  /** [[restrictDelete]] for row-SET deletes (the CDC-apply and HeroQL
    * @remove paths, where the victims arrive as a frame, not a
    * predicate): a key disappears iff the delete claims AT LEAST every
    * row carrying it — per-key `__rm >= __tot`, not equality. The
    * store's own callers pass table-derived frames (sub-multisets,
    * where >= degenerates to =); >= additionally keeps the RESTRICT
    * sound for an over-claiming frame (e.g. a replayed CDC delete
    * whose rows are partly gone already): such a key still loses every
    * surviving carrier, and equality would have silently skipped it. */
  def restrictDeleteRows(tx: Txn, table: String,
      removed: org.apache.spark.sql.DataFrame): Unit =
    fkRows(tx).foreach { case (name, factTable, keys, refTable, refCols) =>
      if (refTable == table && tx.exists(factTable)) {
        val remCnt = removed.groupBy(refCols.map(col): _*)
          .agg(count(lit(1)).as("__rm"))
        val totCnt = tx.read(table).groupBy(refCols.map(col): _*)
          .agg(count(lit(1)).as("__tot"))
        val removedKeys = remCnt.join(totCnt, refCols.toSeq)
          .filter(col("__rm") >= col("__tot"))
          .select(refCols.map(col): _*)
        checkNotReferenced(tx, table, name, factTable, keys, refCols,
          removedKeys)
      }
    }

  private def checkNotReferenced(tx: Txn, table: String, name: String,
      factTable: String, keys: Seq[String], refCols: Seq[String],
      removedKeys: org.apache.spark.sql.DataFrame): Unit = {
    val fact = tx.read(factTable)
    val on = keys.zip(refCols).map { case (k, r) =>
      fact(k) === removedKeys(r) }.reduce(_ && _)
    val referenced = fact.join(removedKeys, on, "left_semi").count()
    if (referenced > 0)
      throw new CheckViolation(table, name, referenced)
  }

  /** Admission control for the UPDATE path: validate the POST-image of
    * the matched rows against every declared constraint BEFORE the COW
    * rewrite commits, plus set-level referential RESTRICT when an
    * update rewrites a referenced key column. Checks scale with the
    * matched slice (check/fk) or a keyed join against the rest of the
    * table (unique) — and skip entirely for constraints whose columns
    * the assignment doesn't touch. Together with [[validate]] (insert)
    * and [[restrictDelete]] (delete/truncate), every facade mutation
    * route is now admission-controlled; `upsert`/`merge` remain
    * chain-breaking (their delete+insert composition has no single
    * post-image to validate incrementally — route critical tables'
    * writes through insert/update/delete or revalidate after). */
  def validateUpdate(tx: Txn, table: String,
      assignments: Map[String, org.apache.spark.sql.Column],
      cond: org.apache.spark.sql.Column): Unit = {
    if (!tx.exists(RegistryT)) return
    val cs = declared(tx, table)
    val incoming = fkRows(tx).filter(_._4 == table)
    if (cs.isEmpty && incoming.isEmpty) return
    val assigned = assignments.keySet
    val matched = tx.read(table).filter(coalesce(cond, lit(false)))
    val others = tx.read(table).filter(not(coalesce(cond, lit(false))))
    val applied = matched.select(matched.columns.map(c =>
      assignments.get(c).map(_.as(c)).getOrElse(col(c))).toIndexedSeq: _*)
    cs.foreach {
      case (name, "check", pred) =>
        val bad = applied.filter(not(expr(pred))).count()
        if (bad > 0) throw new CheckViolation(table, name, bad)
      case (name, "unique", detail) =>
        val keys = detail.split('\t').toSeq
        if (keys.exists(assigned)) {
          val dupIn = applied.groupBy(keys.map(col): _*)
            .count().filter(col("count") > 1).count()
          if (dupIn > 0) throw new CheckViolation(table, name, dupIn)
          val clash = applied.join(others.select(keys.map(col): _*),
            keys, "left_semi").count()
          if (clash > 0) throw new CheckViolation(table, name, clash)
        }
      case (name, "fk", detail) =>
        val (keys, refTable, refCols) = parseFk(detail)
        if (keys.exists(assigned)) {
          val orphans = fkOrphans(applied, tx.read(refTable), keys, refCols)
          if (orphans > 0) throw new CheckViolation(table, name, orphans)
        }
      case _ => ()
    }
    incoming.foreach { case (name, factTable, keys, _, refCols) =>
      if (refCols.exists(assigned) && tx.exists(factTable)) {
        // a referenced key is REMOVED iff it was present among the
        // matched rows' old values and survives in neither the
        // post-image nor the untouched rows — set-level semantics
        val stillThere = applied.select(refCols.map(col): _*)
          .unionByName(others.select(refCols.map(col): _*)).distinct()
        val removed = matched.select(refCols.map(col): _*).distinct()
          .join(stillThere, refCols, "left_anti")
        val fact = tx.read(factTable)
        val on = keys.zip(refCols).map { case (k, r) =>
          fact(k) === removed(r) }.reduce(_ && _)
        val referenced = fact.join(removed, on, "left_semi").count()
        if (referenced > 0)
          throw new CheckViolation(table, name, referenced)
      }
    }
  }

  /** Advance watermarks after a VALIDATED facade update committed in
    * the same txn — [[validateUpdate]] proved the post-image satisfies
    * every declared constraint and removed no referenced key, so the
    * chain algebra is insert's. */
  def advanceAfterUpdate(tx: Txn, table: String, pre: Option[String]): Unit =
    advanceAfterInsert(tx, table, pre)

  /** Advance watermarks after a facade delete from `table` committed
    * in the same txn: removing rows can never break a CHECK, UNIQUE,
    * or the table's own outgoing FKs, and [[restrictDelete]] has
    * already proven no incoming FK lost a referenced key — so every
    * intact chain moves forward. */
  def advanceAfterDelete(tx: Txn, table: String, pre: Option[String]): Unit =
    advanceAfterInsert(tx, table, pre) // identical chain algebra (doc above)

  /** Full re-check of one declared constraint against the CURRENT
    * table state, re-stamping its watermark — the recovery path after
    * a write bypassed admission control (cost ∝ the table, the price
    * of having gone around the front door). Throws [[CheckViolation]]
    * if the constraint no longer holds. */
  def revalidate(store: TableStore, name: String): Unit = store.transaction { tx =>
    val row = tx.read(RegistryT).filter(col("constraint_name") === name)
      .collect().headOption.getOrElse(
        throw new IllegalArgumentException(s"no such constraint: $name"))
    val (table, kind, detail) =
      (row.getAs[String]("base_table"), row.getAs[String]("kind"),
        row.getAs[String]("detail"))
    kind match {
      case "check" =>
        val bad = tx.read(table).filter(not(expr(detail))).count()
        if (bad > 0) throw new CheckViolation(table, name, bad)
        stamp(tx, name, tx.manifestName(table).getOrElse(""), "")
      case "unique" =>
        val keys = detail.split('\t').toSeq
        val dup = tx.read(table).groupBy(keys.map(col): _*)
          .count().filter(col("count") > 1).count()
        if (dup > 0) throw new CheckViolation(table, name, dup)
        stamp(tx, name, tx.manifestName(table).getOrElse(""), "")
      case "fk" =>
        val (keys, refTable, refCols) = parseFk(detail)
        val orphans = fkOrphans(tx.read(table), tx.read(refTable), keys, refCols)
        if (orphans > 0) throw new CheckViolation(table, name, orphans)
        stamp(tx, name, tx.manifestName(table).getOrElse(""),
          tx.manifestName(refTable).getOrElse(""))
      case other => throw new IllegalStateException(
        s"unknown constraint kind '$other' for '$name'")
    }
  }

  /** True iff eliminating `fact ⋈ dim ON pairs` is PROVEN sound right
    * now: a declared FK covers exactly `pairs` (fact fk → dim pk), a
    * declared UNIQUE on dim covers exactly the pk columns, and both
    * watermark chains reach the tables' CURRENT manifests (every
    * commit since the last full validation went through admission
    * control). Consulted by [[graft.plans.FkJoinElim]] per candidate
    * join; cost is two driver-side reads of constraint-sized tables. */
  /** True iff a `DISTINCT` (or group-only aggregate) over `cols` of
    * `table` is PROVEN to be the identity right now: a declared UNIQUE
    * whose key set is a SUBSET of `cols` is valid at the table's
    * CURRENT manifest. Sound for NULL keys too — the store's UNIQUE
    * groups NULLs together (at most one NULL-key row can ever
    * validate), matching DISTINCT's null-equality. Consulted by
    * [[graft.plans.DistinctElim]]; cost is two driver-side reads of
    * constraint-sized tables. */
  def uniqueDistinctReady(store: TableStore, table: String,
      cols: Set[String]): Boolean = {
    if (!store.exists(RegistryT) || !store.exists(ValidT)) false
    else store.currentManifestName(table) match {
      case Some(m) =>
        val mem = store.read(ValidT).collect().map(r =>
          r.getAs[String]("constraint_name") -> r.getAs[String]("manifest"))
          .toMap
        store.read(RegistryT).collect().exists { r =>
          r.getAs[String]("kind") == "unique" &&
            r.getAs[String]("base_table") == table &&
            r.getAs[String]("detail").split('\t').toSet.subsetOf(cols) &&
            mem.get(r.getAs[String]("constraint_name")).contains(m)
        }
      case None => false
    }
  }

  def fkEliminationReady(store: TableStore, fact: String, dim: String,
      pairs: Seq[(String, String)]): Boolean = {
    if (!store.exists(RegistryT) || !store.exists(ValidT)) false
    else (store.currentManifestName(fact), store.currentManifestName(dim)) match {
      case (Some(factM), Some(dimM)) =>
        val mem = store.read(ValidT).collect().map(r =>
          r.getAs[String]("constraint_name") ->
            ((r.getAs[String]("manifest"), r.getAs[String]("ref_manifest"))))
          .toMap
        val reg = store.read(RegistryT).collect()
        val fkOk = reg.exists { r =>
          r.getAs[String]("kind") == "fk" && {
            val (keys, rt, refCols) = parseFk(r.getAs[String]("detail"))
            r.getAs[String]("base_table") == fact && rt == dim &&
              keys.zip(refCols).toSet == pairs.toSet &&
              mem.get(r.getAs[String]("constraint_name"))
                .contains((factM, dimM))
          }
        }
        val pkCols = pairs.map(_._2).toSet
        val uqOk = reg.exists { r =>
          r.getAs[String]("kind") == "unique" &&
            r.getAs[String]("base_table") == dim &&
            r.getAs[String]("detail").split('\t').toSet == pkCols &&
            mem.get(r.getAs[String]("constraint_name")).exists(_._1 == dimM)
        }
        fkOk && uqOk
      case _ => false
    }
  }
}
