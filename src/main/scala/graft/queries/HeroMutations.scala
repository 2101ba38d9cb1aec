package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.heroql.HeroQL
import graft.store.TableStore

/** The reference's UPDATE surface driven from HeroQL text
  * (`Kernel/README.md:210-234`): AddExam/UpdateExam/RemoveExam parsed,
  * analyzed, and executed against a scratch [[TableStore]]; the final
  * committed table is the oracle-checked result. */
object HeroMutations extends QueryPack {

  private val program = """
data Exams(student: string, score: int).

query AddExam(student: string, score: int)
:-  @insert Exams(student, score)
.

query UpdateExam(student: string, score: int)
:-  @update Exams(student, @score)
.

query RemoveExam(student: string)
:-  @remove Exams(student, _)
.
"""

  private def seed(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders").filter(col("o_orderkey") % 10 === 0).select(
      col("o_custkey").cast("string").as("student"),
      expr("CAST(floor(o_totalprice) AS INT)").as("score"))

  private def scratch(s: SparkSession, d: String): TableStore = {
    val st = new TableStore(s, Files.createTempDirectory("graft-hql-store-").toString)
    st.create("Exams", seed(s, d))
    st
  }

  /** hm1 — `@insert Exams(student, score)` with bulk args. */
  private def hm1(s: SparkSession, d: String): DataFrame = {
    val st = scratch(s, d)
    val args = t(s, d, "orders").filter(col("o_orderkey") % 10 === 1).select(
      col("o_custkey").cast("string").as("student"),
      expr("CAST(floor(o_totalprice) AS INT) + 7").as("score"))
    HeroQL.executeMutation(program, "AddExam", args, st)
    st.read("Exams")
  }

  /** hm2 — `@update Exams(student, @score)`: set score for matched
    * students. */
  private def hm2(s: SparkSession, d: String): DataFrame = {
    val st = scratch(s, d)
    val args = t(s, d, "orders")
      .filter(col("o_orderkey") % 10 === 0 && col("o_orderstatus") === "O")
      .select(col("o_custkey").cast("string").as("student")).distinct()
      .withColumn("score", lit(999))
    HeroQL.executeMutation(program, "UpdateExam", args, st)
    st.read("Exams")
  }

  /** hm3 — `@remove Exams(student, _)`: delete all rows for matched
    * students. */
  private def hm3(s: SparkSession, d: String): DataFrame = {
    val st = scratch(s, d)
    val args = t(s, d, "orders")
      .filter(col("o_orderkey") % 10 === 0 && col("o_orderpriority") === "5-LOW")
      .select(col("o_custkey").cast("string").as("student")).distinct()
    HeroQL.executeMutation(program, "RemoveExam", args, st)
    st.read("Exams")
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "hm1_hql_insert" -> (hm1 _),
    "hm2_hql_update" -> (hm2 _),
    "hm3_hql_remove" -> (hm3 _),
  )

  private val seedSql =
    """SELECT CAST(o_custkey AS VARCHAR) AS student,
              CAST(floor(o_totalprice) AS INTEGER) AS score
       FROM orders WHERE o_orderkey % 10 = 0"""

  override val oracles: Map[String, String] = Map(
    "hm1_hql_insert" ->
      s"""$seedSql
         UNION ALL
         SELECT CAST(o_custkey AS VARCHAR) AS student,
                CAST(floor(o_totalprice) AS INTEGER) + 7 AS score
         FROM orders WHERE o_orderkey % 10 = 1""",
    "hm2_hql_update" ->
      s"""SELECT student,
                CASE WHEN student IN (
                  SELECT DISTINCT CAST(o_custkey AS VARCHAR)
                  FROM orders WHERE o_orderkey % 10 = 0 AND o_orderstatus = 'O')
                THEN 999 ELSE score END AS score
         FROM ($seedSql)""",
    "hm3_hql_remove" ->
      s"""SELECT student, score FROM ($seedSql)
         WHERE student NOT IN (
           SELECT DISTINCT CAST(o_custkey AS VARCHAR)
           FROM orders WHERE o_orderkey % 10 = 0 AND o_orderpriority = '5-LOW')""",
  )
}
