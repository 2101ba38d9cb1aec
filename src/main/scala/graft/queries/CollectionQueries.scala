package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.heroql.HeroQL

/** The draft's `collection_query` pipeline surface
  * (`Kernel/Drafts/draft:148-156`, `draft_students:37-53`): the three
  * worked samples, re-bound to AttendExam := lineitem (student =
  * l_suppkey, exam = l_partkey, score = floor(l_quantity)). */
object CollectionQueries extends QueryPack {

  private val declsProgram = """
data AttendExam(student: int64, exam: int64, score: int).
"""

  private def catalog(s: SparkSession, d: String): Map[String, DataFrame] = Map(
    "AttendExam" -> t(s, d, "lineitem").select(
      col("l_suppkey").as("student"),
      col("l_partkey").as("exam"),
      expr("CAST(floor(l_quantity) AS INT)").as("score")))

  /** cq1 — "top 3 by exam" (`draft_students:37-40`). */
  private def cq1(s: SparkSession, d: String): DataFrame =
    HeroQL.compileCollection(declsProgram,
      """collection_query(student, exam, score) :-
           AttendExam(student, exam, score)
         partition_by exam(student, exam, sample_score = OrderByDesc(score, 3))
         ;""",
      catalog(s, d))

  /** cq2 — "number of 30-scores by student" (`draft_students:43-46`,
    * score constant adapted to the fixture's value range). */
  private def cq2(s: SparkSession, d: String): DataFrame =
    HeroQL.compileCollection(declsProgram,
      """collection_query(student, score) :-
           AttendExam(student, _, score),
           where score == 30
         group_by student(student, n_scores = Count(score))
         ;""",
      catalog(s, d))

  /** cq3 — "highest average score" with having + order + range
    * (`draft:148-156`, `draft_students:49-53`). */
  private def cq3(s: SparkSession, d: String): DataFrame =
    HeroQL.compileCollection(declsProgram,
      """collection_query(student, exam, score) :-
           AttendExam(student, exam, score)
         group_by exam(exam, average_score = Average(score))
         :- average_score > 10
         order_by_desc average_score
         range_by 1..5
         ;""",
      catalog(s, d))

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cq1_partition_topk" -> (cq1 _),
    "cq2_where_groupby_count" -> (cq2 _),
    "cq3_having_order_range" -> (cq3 _),
  )

  private val aeSql =
    """SELECT l_suppkey AS student, l_partkey AS exam,
              CAST(floor(l_quantity) AS INTEGER) AS score FROM lineitem"""

  override val oracles: Map[String, String] = Map(
    "cq1_partition_topk" ->
      s"""SELECT student, exam, score AS sample_score FROM (
           SELECT student, exam, score,
             row_number() OVER (PARTITION BY exam
               ORDER BY score DESC, student ASC) AS rn
           FROM ($aeSql)) WHERE rn <= 3""",
    "cq2_where_groupby_count" ->
      s"""SELECT student, count(score) AS n_scores
         FROM ($aeSql) WHERE score = 30 GROUP BY student""",
    "cq3_having_order_range" ->
      s"""SELECT exam, avg(score) AS average_score
         FROM ($aeSql) GROUP BY exam HAVING avg(score) > 10
         ORDER BY average_score DESC, exam ASC LIMIT 5""",
  )
}
