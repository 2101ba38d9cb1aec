package graft.heroql

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import graft.store.TableStore

/** Cached-query materialization (`Kernel/README.md:142-161`): the first
  * evaluation of a cached query materializes its result into the store
  * (`memo_<name>`), later calls serve the committed snapshot. While a
  * result is being computed a "calculating" sentinel exists; re-entering
  * the same cache key during computation is an error (stop, not a
  * filter-fail) — exactly the reference's recursion guard.
  *
  * Scale: the memo is a normal store table — Parquet files behind an
  * atomic manifest — so serving a cached query is a plain columnar scan,
  * and `uncache` (M4, `Kernel/Drafts/draft:135-136`) is a manifest drop.
  */
final class QueryCache(store: TableStore) {

  private def memoName(name: String) = s"memo_$name"
  private def marker(name: String) =
    Paths.get(store.root, s"_CALCULATING_$name")

  // Recursion detection is SESSION-scoped: re-entering the same key within
  // one evaluation is the reference's "calculating" stop condition. The
  // on-disk marker is kept only as an observability breadcrumb — a marker
  // left behind by a crashed JVM is stale by definition (no live thread of
  // this process is computing it) and must not poison the key forever.
  private val calculating =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def isCached(name: String): Boolean = store.exists(memoName(name))

  /** Serve `name` from the memo, computing and materializing on miss. */
  def cached(name: String)(build: => DataFrame): DataFrame = {
    val t = memoName(name)
    if (store.exists(t)) store.read(t)
    else {
      if (!calculating.add(name))
        throw Analyzer.AnalysisError(
          s"cached query $name is already calculating (recursive evaluation)")
      Files.createDirectories(Paths.get(store.root))
      Files.deleteIfExists(marker(name)) // stale crash leftover, if any
      Files.createFile(marker(name))
      try store.create(t, build)
      finally {
        calculating.remove(name)
        Files.deleteIfExists(marker(name))
      }
      store.read(t)
    }
  }

  /** `uncache Name` — drop the materialization (whole-result memo AND
    * any index-keyed memo); next call recomputes. */
  def uncache(name: String): Unit = {
    store.drop(memoName(name))
    if (store.exists(keysName(name))) store.drop(keysName(name))
  }

  // ------------------- index-keyed lookup (`Kernel/README.md:142-157`)

  private def keysName(name: String) = s"memo_${name}__keys"

  /** INDEX-KEYED cached lookup: "the index for caching is used to see if
    * the result has been calculated" (`Kernel/README.md:148-157`).
    *
    * Cover analysis over the declared `indexes` (each a column list):
    *  - COVERED — some index's columns are all provided: the memo is
    *    keyed by that index's values. A hit serves the committed memo
    *    slice without recompute; a miss computes ONLY the demanded slice
    *    (`build` receives the bindings, the constants push into the
    *    scan), appends result rows + a key-registry row in one atomic
    *    commit, then serves.
    *  - PARTIAL / NOT COVERED — provided values cover no index fully:
    *    evaluated directly, nothing memoized (the reference leaves this
    *    "consider about" — recompute is the safe lattice bottom).
    *
    * Scale: the memo is a normal store table; each miss appends one new
    * parquet dir (insert never rewrites), the key registry stays
    * metadata-sized, and a hit is a pushed-down columnar scan of the
    * memo. */
  def cachedIndexed(name: String, indexes: Seq[Seq[String]],
      provided: Map[String, Any])(build: Map[String, Any] => DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val covering = indexes.find(idx => idx.nonEmpty && idx.forall(provided.contains))
    covering match {
      case None => build(provided) // partial/uncovered: no memoization
      case Some(idx) =>
        val t = memoName(name)
        val kt = keysName(name)
        val cond = idx.map(c => col(c) === lit(provided(c))).reduce(_ && _)
        val computed = store.exists(kt) &&
          store.read(kt).filter(cond).limit(1).count() > 0
        if (!computed) {
          val guardKey = s"$name[${idx.map(provided).mkString(",")}]"
          if (!calculating.add(guardKey))
            throw Analyzer.AnalysisError(
              s"cached query $guardKey is already calculating (recursive evaluation)")
          try {
            val rows = build(provided)
            val keyRow = {
              val spark = store.spark
              import org.apache.spark.sql.{Row => R}
              import org.apache.spark.sql.types._
              val fields = idx.map { c =>
                StructField(c, provided(c) match {
                  case _: Long | _: Int => LongType
                  case _: Double => DoubleType
                  case _: Boolean => BooleanType
                  case _ => StringType
                })
              }
              spark.createDataFrame(
                spark.sparkContext.parallelize(Seq(R.fromSeq(idx.map { c =>
                  provided(c) match { case i: Int => i.toLong; case v => v }
                })), 1),
                StructType(fields))
            }
            store.transaction { tx =>
              if (store.exists(t)) tx.insert(t, rows) else tx.create(t, rows)
              if (store.exists(kt)) tx.insert(kt, keyRow) else tx.create(kt, keyRow)
            }
          } finally calculating.remove(guardKey)
        }
        store.read(t).filter(cond)
    }
  }
}
