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
