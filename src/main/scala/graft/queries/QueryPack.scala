package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-checkable queries.
  *
  * Each entry in `queries` is a plan builder `(session, sfDir) => df`; for
  * every SQL-expressible entry, `oracles` carries equivalent ANSI SQL that
  * DuckDB runs over the same parquet tables (the t2 correctness gate,
  * BASELINE.md). Column names are aligned on both sides because the
  * driver's compare sorts columns by name before hashing.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
