package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.heroql.{Analyzer, QueryCache}
import graft.store.TableStore

class QueryCacheSpec extends SparkSpec {

  private def fresh() = new QueryCache(
    new TableStore(spark, Files.createTempDirectory("graft-memo-").toString))

  test("first call materializes, second call serves the memo without recompute") {
    import spark.implicits._
    val qc = fresh()
    var builds = 0
    def build = { builds += 1; Seq((1, "a"), (2, "b")).toDF("k", "v") }
    assert(qc.cached("q")(build).count() == 2)
    assert(qc.cached("q")(build).count() == 2)
    assert(builds == 1, "memo hit must not rebuild")
    assert(qc.isCached("q"))
  }

  test("uncache drops the materialization and the next call recomputes") {
    import spark.implicits._
    val qc = fresh()
    var builds = 0
    def build = { builds += 1; Seq((1, "a")).toDF("k", "v") }
    qc.cached("q")(build)
    qc.uncache("q")
    assert(!qc.isCached("q"))
    qc.cached("q")(build)
    assert(builds == 2)
  }

  test("re-entering a calculating cache key errors (recursion guard)") {
    import spark.implicits._
    val qc = fresh()
    val e = intercept[Analyzer.AnalysisError] {
      qc.cached("r") {
        // a recursive evaluation would land back on the same key
        qc.cached("r")(Seq((1, "x")).toDF("k", "v"))
      }
    }
    assert(e.getMessage.contains("calculating"))
  }

  test("'cached query' declarations serve the committed memo until uncached") {
    import spark.implicits._
    import graft.heroql.HeroQL
    val store = new TableStore(spark, Files.createTempDirectory("graft-memo-").toString)
    val qc = new QueryCache(store)
    val src =
      """data T(k: int64, v: int64).
        |cached query Doubled(k: int64) -> (v2: int64)
        |:- T(k, v), v2 <- v + v
        |.""".stripMargin
    var data = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    def run() = HeroQL.compileCached(src, "Doubled", Map("T" -> data), qc)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run() == Map(1L -> 20L, 2L -> 40L))
    // source changes are NOT visible through the memo (reference
    // semantics: the cache serves its snapshot until uncached)
    data = Seq((1L, 99L)).toDF("k", "v")
    assert(run() == Map(1L -> 20L, 2L -> 40L))
    // the statement form of M4
    HeroQL.executeUncache("uncache Doubled.", qc)
    assert(run() == Map(1L -> 198L))
  }

  test("index-keyed lookup: covered values memoize per key, hits never rebuild") {
    import spark.implicits._
    val qc = fresh()
    var builds = 0
    def build(bound: Map[String, Any]) = {
      builds += 1
      Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "v")
        .filter(col("k") === lit(bound("k")))
    }
    val idx = Seq(Seq("k"))
    // miss on k=1 computes only that slice
    assert(qc.cachedIndexed("q", idx, Map("k" -> 1L))(build).count() == 2)
    assert(builds == 1)
    // hit on k=1 serves the memo
    assert(qc.cachedIndexed("q", idx, Map("k" -> 1L))(build).count() == 2)
    assert(builds == 1, "covered hit must not rebuild")
    // different key value: computes and extends the memo
    assert(qc.cachedIndexed("q", idx, Map("k" -> 2L))(build).count() == 1)
    assert(builds == 2)
    assert(qc.cachedIndexed("q", idx, Map("k" -> 2L))(build).count() == 1)
    assert(builds == 2)
    // a key with an EMPTY result is still memoized (absence is a result)
    assert(qc.cachedIndexed("q", idx, Map("k" -> 7L))(build).count() == 0)
    assert(qc.cachedIndexed("q", idx, Map("k" -> 7L))(build).count() == 0)
    assert(builds == 3, "empty slice must be served from the key registry")
  }

  test("index-keyed lookup: partial and uncovered values evaluate without memoizing") {
    import spark.implicits._
    val qc = fresh()
    var builds = 0
    def build(bound: Map[String, Any]) = {
      builds += 1
      Seq((1L, 10L, "a"), (1L, 20L, "b")).toDF("a", "b", "v")
    }
    val composite = Seq(Seq("a", "b"))
    // partial: only `a` of the (a, b) index provided
    qc.cachedIndexed("q2", composite, Map("a" -> 1L))(build)
    qc.cachedIndexed("q2", composite, Map("a" -> 1L))(build)
    assert(builds == 2, "partial cover must recompute (nothing memoized)")
    // uncovered: provided value not in any index
    qc.cachedIndexed("q2", composite, Map("v" -> "a"))(build)
    assert(builds == 3)
    // fully covering the composite index memoizes
    qc.cachedIndexed("q2", composite, Map("a" -> 1L, "b" -> 10L))(build)
    qc.cachedIndexed("q2", composite, Map("a" -> 1L, "b" -> 10L))(build)
    assert(builds == 4, "composite cover must serve the memo")
  }

  test("cached query with index declaration serves point lookups without recompute") {
    import spark.implicits._
    import graft.heroql.HeroQL
    val store = new TableStore(spark, Files.createTempDirectory("graft-memo-").toString)
    val qc = new QueryCache(store)
    val src =
      """data Exams(student: string, score: int64).
        |cached query ByStudent(student: string) -> (score: int64)
        |:- Exams(student, score)
        |.
        |index ByStudent { Hash(student) }
        |""".stripMargin
    var data = Seq(("ann", 10L), ("ann", 20L), ("bob", 30L)).toDF("student", "score")
    def lookup(s: String) = HeroQL.compileCachedLookup(src, "ByStudent",
      Map("Exams" -> data), qc, Map("student" -> s))
    assert(lookup("ann").count() == 2)
    val commitsAfterFirst = store.commitCount()
    // new key: one more commit extends the memo
    assert(lookup("bob").count() == 1)
    assert(store.commitCount() == commitsAfterFirst + 1)
    // hit: no new commit, and source changes are invisible (snapshot)
    data = Seq(("ann", 99L)).toDF("student", "score")
    assert(lookup("ann").collect().map(_.getLong(1)).sorted.toSeq == Seq(10L, 20L))
    assert(store.commitCount() == commitsAfterFirst + 1, "hit must not commit")
    // uncache drops memo + key registry; next lookup recomputes fresh data
    HeroQL.executeUncache("uncache ByStudent.", qc)
    assert(lookup("ann").collect().map(_.getLong(1)).toSeq == Seq(99L))
  }

  test("recursion guard applies per index value") {
    import spark.implicits._
    val qc = fresh()
    val e = intercept[Analyzer.AnalysisError] {
      qc.cachedIndexed("r2", Seq(Seq("k")), Map("k" -> 1L)) { _ =>
        qc.cachedIndexed("r2", Seq(Seq("k")), Map("k" -> 1L))(_ =>
          Seq((1L, "x")).toDF("k", "v"))
      }
    }
    assert(e.getMessage.contains("calculating"))
  }

  test("exportTable writes a self-contained parquet snapshot") {
    import spark.implicits._
    val store = new TableStore(spark, Files.createTempDirectory("graft-exp-").toString)
    store.create("t", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    store.insert("t", Seq((3L, "c")).toDF("k", "v"))
    val dest = Files.createTempDirectory("graft-exp-out-").toString + "/t"
    store.exportTable("t", dest)
    val back = spark.read.parquet(dest)
    assert(back.count() == 3)
    assert(back.orderBy("k").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }
}
