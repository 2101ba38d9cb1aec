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

  /** cq4 — the classic warehouse 3-way analytics join from LANGUAGE
    * text (the TPC-H Q3 shape): segment-filtered customers ⋈ orders ⋈
    * lineitem, revenue per order in half-up cents (exact — identical
    * float expression both engines, integer sum), top-10 by revenue
    * with the order key as tie-break. Compiles to two shuffle
    * equi-joins + one partial-aggregated exchange + TakeOrdered —
    * the same plan a hand-written DataFrame chain produces. */
  private def cq4(s: SparkSession, d: String): DataFrame =
    HeroQL.compileCollection(
      """data Cust(c: int64).
        |data Ord(o: int64, c: int64).
        |data Li(o: int64, pc: int64).
        |""".stripMargin,
      """collection_query(o, revenue_c) :-
           Cust(c), Ord(o, c), Li(o, pc)
         group_by o(o, revenue_c = Sum(pc))
         order_by_desc revenue_c
         range_by 1..10
         ;""",
      Map(
        "Cust" -> t(s, d, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("c")),
        "Ord" -> t(s, d, "orders")
          .select(col("o_orderkey").as("o"), col("o_custkey").as("c")),
        "Li" -> t(s, d, "lineitem").select(col("l_orderkey").as("o"),
          expr("CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT)")
            .as("pc"))))

  /** cq5 — the 6-table TPC-H Q5 shape from LANGUAGE text: revenue per
    * nation for one region, with the signature Q5 twist that supplier
    * and customer must share a nation — expressed in the rule body as
    * the SHARED VARIABLE `n` across `Cust` and `Supp` (conjunctive
    * joins are where the rule syntax beats SQL for readability). Plan:
    * region and nation broadcast into the probe side, the three big
    * joins shuffle on their keys, revenue partial-aggregates map-side
    * in exact cents. */
  private def cq5(s: SparkSession, d: String): DataFrame =
    HeroQL.compileCollection(
      """data Region(r: int64).
        |data Nation(n: int64, r: int64, nname: string).
        |data Cust(c: int64, n: int64).
        |data Ord(o: int64, c: int64).
        |data Li(o: int64, sk: int64, pc: int64).
        |data Supp(sk: int64, n: int64).
        |""".stripMargin,
      """collection_query(nname, revenue_c) :-
           Region(r), Nation(n, r, nname), Cust(c, n), Ord(o, c),
           Li(o, sk, pc), Supp(sk, n)
         group_by nname(nname, revenue_c = Sum(pc))
         order_by_desc revenue_c
         ;""",
      Map(
        "Region" -> t(s, d, "region").filter(col("r_name") === "ASIA")
          .select(col("r_regionkey").as("r")),
        "Nation" -> t(s, d, "nation").select(col("n_nationkey").as("n"),
          col("n_regionkey").as("r"), col("n_name").as("nname")),
        "Cust" -> t(s, d, "customer")
          .select(col("c_custkey").as("c"), col("c_nationkey").as("n")),
        "Ord" -> t(s, d, "orders")
          .select(col("o_orderkey").as("o"), col("o_custkey").as("c")),
        "Li" -> t(s, d, "lineitem").select(col("l_orderkey").as("o"),
          col("l_suppkey").as("sk"),
          expr("CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT)")
            .as("pc")),
        "Supp" -> t(s, d, "supplier")
          .select(col("s_suppkey").as("sk"), col("s_nationkey").as("n"))))

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cq5_tpch_q5_shape" -> (cq5 _),
    "cq1_partition_topk" -> (cq1 _),
    "cq2_where_groupby_count" -> (cq2 _),
    "cq3_having_order_range" -> (cq3 _),
    "cq4_tpch_q3_shape" -> (cq4 _),
  )

  private val aeSql =
    """SELECT l_suppkey AS student, l_partkey AS exam,
              CAST(floor(l_quantity) AS INTEGER) AS score FROM lineitem"""

  override val oracles: Map[String, String] = Map(
    "cq5_tpch_q5_shape" ->
      """SELECT n_name AS nname,
                CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                  * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c
         FROM region
         JOIN nation ON n_regionkey = r_regionkey
         JOIN customer ON c_nationkey = n_nationkey
         JOIN orders ON o_custkey = c_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         JOIN supplier ON s_suppkey = l_suppkey
           AND s_nationkey = c_nationkey
         WHERE r_name = 'ASIA'
         GROUP BY n_name""",
    // identical float expression, integer sum, (revenue, key) total order
    "cq4_tpch_q3_shape" ->
      """SELECT o, revenue_c FROM (
           SELECT o_orderkey AS o,
                  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                    * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c
           FROM customer
           JOIN orders ON c_custkey = o_custkey
           JOIN lineitem ON l_orderkey = o_orderkey
           WHERE c_mktsegment = 'BUILDING'
           GROUP BY o_orderkey)
         ORDER BY revenue_c DESC, o ASC LIMIT 10""",
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
