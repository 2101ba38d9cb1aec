package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{AdminQueries, CollectionQueries, Dedup, EventAnalytics, GraphQueries, HeroMutations, HeroQueries, MatViewQueries, MultimodalQueries, Mutations, PackageQueries, PipelineQueries, QueryPack, Relational, Similarity, SourceQueries, Streaming, TextAnalysis, TokenizerQueries, TrainingSetQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every [[graft.queries.QueryPack]]: each pack maps one slice
  * of SURVEY.md §2's operator inventory (the query semantics the
  * reference *designs* in `Kernel/README.md` + `Kernel/Drafts/draft*`;
  * it implements none of them in code — SURVEY.md §0) to declarative
  * DataFrame plans plus DuckDB oracle SQL for the t2 gate.
  */
object SparkEntry {
  private val packs: Seq[QueryPack] = Seq(
    Relational,
    TextAnalysis,
    Dedup,
    Similarity,
    GraphQueries,
    Streaming,
    EventAnalytics,
    Mutations,
    MatViewQueries,
    AdminQueries,
    HeroQueries,
    HeroMutations,
    CollectionQueries,
    MultimodalQueries,
    PackageQueries,
    SourceQueries,
    PipelineQueries,
    TrainingSetQueries,
    TokenizerQueries,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's pipeline showcase (`Kernel/README.md:188-205`,
    * per-partition aggregate after rank) over lineitem. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("a2_group_multi_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
