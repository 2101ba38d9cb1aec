package graft.store

/** Manifest-stamp probe for the TRANSPARENT read-path skipping rule
  * ([[graft.plans.AutoSkip]]): given the dir names a plan actually
  * scans and the point/range conjuncts of the filter above it, decide
  * which dirs the stamps keep — pure driver-side manifest math, the
  * same [[BloomSkipping]]/[[ZoneMaps]] predicates the explicit
  * `readEquals`/`readRange` APIs evaluate, shared so the two probes
  * can never drift.
  *
  * The reference declares indexes ON tables and expects queries to be
  * served by them without naming them (`Kernel/README.md:62-74`); this
  * facade is what lets a plain `store.read(t).filter(col === k)` — or
  * a HeroQL atom with a bound argument — prune commits the way the
  * special APIs do.
  *
  * Soundness is LOCAL: the caller hands us the filter that Catalyst
  * already placed DIRECTLY above the raw scan, so every removed dir
  * holds only rows that filter would reject (Bloom: no false
  * negatives; zone: interval disjointness) — whatever sits above the
  * filter (deletion-vector anti-joins, schema-op projections, MOR
  * merges) can only remove MORE rows. Pending schema ops still
  * disable pruning entirely (defense in depth, the explicit APIs'
  * contract), and any dir without a stamp is kept.
  */
object AutoSkipProbe {

  /** One string-interval conjunct in UTF-8 BYTE space (binary order —
    * [[ZoneMaps.cmpBytes]]): optional bounds, per-side inclusivity.
    * A prefix probe is `[prefix, prefixUpper(prefix))`. */
  final case class SRange(column: String,
      lo: Option[Array[Byte]], loIncl: Boolean,
      hi: Option[Array[Byte]], hiIncl: Boolean)

  /** The subset of `dirs` (manifest dir-name strings, all belonging
    * to `table`) kept under the conjunction of `points` (column →
    * equality/IN keys, Long or String), `ranges` (column, lo, hi —
    * inclusive, over the BIGINT cast), and `sranges` (string-interval
    * conjuncts over the zm string stamps). Returns None when the
    * manifest's stamps must not drive pruning for this table (pending
    * schema ops). A table with no stamps at all keeps everything. */
  private[graft] def keptSubset(store: TableStore, table: String,
      dirs: Seq[String],
      points: Seq[(String, Seq[Any])],
      ranges: Seq[(String, Long, Long)],
      sranges: Seq[SRange] = Seq.empty,
      // tagged long-space intervals: epoch-micros conjuncts against the
      // t64 timestamp stamps, total-order-bits conjuncts against the
      // d64 double stamps (both inclusive; [[ZoneMaps.keepDirTagged]])
      tranges: Seq[(String, Long, Long)] = Seq.empty,
      dranges: Seq[(String, Long, Long)] = Seq.empty): Option[Seq[String]] = {
    val entries = store.currentEntries(table)
    if (entries.exists(_.isInstanceOf[OpEntry])) return None
    // mid-evolution layout (2+ PartColsEntry lines): the explicit
    // readPruned path refuses to prune here, so the shared contract —
    // the two probes can never drift — requires this probe refuse too.
    // (Dir-narrowing alone would likely stay sound: AutoSkip only
    // narrows dirs the plan already scans under the right layout. But
    // "likely sound under a state the explicit APIs deliberately
    // avoid" is not a contract; partition evolution is a transient
    // window and full reads there cost nothing at steady state.)
    if (entries.count(_.isInstanceOf[PartColsEntry]) > 1) return None
    val props = entries.collectFirst { case PropsEntry(ps) => ps }
      .getOrElse(Map.empty)
    if (props.isEmpty) return Some(dirs)
    val m = props.get(BloomSkipping.BitsProp)
      .flatMap(v => scala.util.Try(v.toInt).toOption)
      .getOrElse(BloomSkipping.DefaultBits)
    val h = props.get(BloomSkipping.HashesProp)
      .flatMap(v => scala.util.Try(v.toInt).toOption)
      .getOrElse(BloomSkipping.DefaultHashes)
    // per-(column, keys) probes hoisted out of the dir loop: key
    // positions are computed once per conjunct, not once per dir
    val pointChecks: Seq[String => Boolean] = points.map { case (c, keys) =>
      val posPerKey = keys.map(BloomSkipping.keyPositions(_, m, h))
      // numeric point keys also consult the zone interval (free extra
      // pruning on ordered ingest); string keys are Bloom-only — zone
      // stats exist only for BIGINT-castable columns
      val longKeys = keys.collect { case n: Long => n }
      d => BloomSkipping.keepDirForKeys(props, d, c, m, posPerKey) &&
        (longKeys.size != keys.size ||
          longKeys.exists(k => ZoneMaps.keepDir(props, d, c, k, k)))
    }
    val rangeChecks: Seq[String => Boolean] = ranges.map { case (c, lo, hi) =>
      d => ZoneMaps.keepDir(props, d, c, lo, hi)
    }
    val srangeChecks: Seq[String => Boolean] = sranges.map { r =>
      d => ZoneMaps.keepDirString(props, d, r.column,
        r.lo, r.loIncl, r.hi, r.hiIncl)
    }
    val trangeChecks: Seq[String => Boolean] = tranges.map { case (c, lo, hi) =>
      d => ZoneMaps.keepDirTagged(props, d, c, "t64:", lo, hi)
    }
    val drangeChecks: Seq[String => Boolean] = dranges.map { case (c, lo, hi) =>
      d => ZoneMaps.keepDirTagged(props, d, c, "d64:", lo, hi)
    }
    Some(dirs.filter(d =>
      pointChecks.forall(_(d)) && rangeChecks.forall(_(d)) &&
        srangeChecks.forall(_(d)) && trangeChecks.forall(_(d)) &&
        drangeChecks.forall(_(d))))
  }
}
