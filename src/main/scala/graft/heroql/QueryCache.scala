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

  /** `uncache Name` — drop the materialization; next call recomputes. */
  def uncache(name: String): Unit = store.drop(memoName(name))
}
