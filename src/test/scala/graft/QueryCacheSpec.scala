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
}
