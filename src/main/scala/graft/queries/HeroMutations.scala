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

query PurgeExam(student: string)
:-  @remove_mor Exams(student, _)
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

  /** hm8 — `@remove_mor Exams(student, _)`: hm3's removal as a
    * MERGE-ON-READ delete from language text — the commit writes only
    * a deletion vector (zero data dirs rewritten; the asserted
    * invariant), and the read answers through it. Same oracle SQL as
    * the COW form: the two deletes must be observationally equal. */
  private def hm8(s: SparkSession, d: String): DataFrame = {
    val st = scratch(s, d)
    val dirsBefore = st.dataDirs("Exams")
    val args = t(s, d, "orders")
      .filter(col("o_orderkey") % 10 === 0 && col("o_orderpriority") === "5-LOW")
      .select(col("o_custkey").cast("string").as("student")).distinct()
    HeroQL.executeMutation(program, "PurgeExam", args, st)
    require(st.dataDirs("Exams") == dirsBefore,
      "hm8: @remove_mor must not rewrite any data dir")
    require(st.deletionVectorDirs("Exams").nonEmpty,
      "hm8: the commit must carry a deletion vector")
    st.read("Exams")
  }

  /** The reference's STATEMENT surface (`Kernel/Drafts/draft:130-144` +
    * `Kernel/README.md:251-254`): `let <name> = query ...` names a
    * derived relation, `transaction query` applies multiple mutations in
    * one atomic commit, `for query (...) ( set ... )` iterates a query
    * into a bulk mutation. */
  private val scriptProgram = """
data Exams(student: string, score: int).
data Honors(student: string, score: int).
data Bonus(student: string, amount: int).

let HighExams = query (student, score)
:-  Exams(student, score), score > 300000
.

transaction query Promote()
:-  HighExams(student, score),
    @insert Honors(student, score),
    @remove Exams(student, score)
.

for query(student, score) :-
    HighExams(student, score)
(
    set Bonus(student, score + 1000)
)
"""

  /** hm4 — `let` + `transaction query` text forms: move high scores from
    * Exams to Honors in ONE atomic commit; result shows both effects. */
  private def hm4(s: SparkSession, d: String): DataFrame = {
    val st = scratch(s, d)
    HeroQL.executeTransaction(scriptProgram, "Promote", Map.empty, st)
    st.read("Exams").withColumn("bucket", lit("live"))
      .unionByName(st.read("Honors").withColumn("bucket", lit("honors")))
  }

  /** hm5 — `for query (...) ( set ... )` lowered to one bulk merge: the
    * body derives the row set once, the action inserts per row. */
  private def hm5(s: SparkSession, d: String): DataFrame = {
    val st = scratch(s, d)
    HeroQL.executeFor(scriptProgram, Map.empty, st)
    st.read("Bonus")
  }

  private val uniqueProgram = """
data Roster(student: string, score: int).

query Enroll(student: string, score: int)
:-  @insert Roster(student, score)
.

index Roster { Unique(student) }
"""

  /** hm6 — the reference's `Unique` index kind
    * (`Kernel/README.md:64-74`) ENFORCED from the language surface: a
    * program declaring `index Roster { Unique(student) }` gates every
    * `@insert` — a batch repeating committed students (and one
    * duplicating a key within itself) is rejected whole with the real
    * diagnosis, the conforming batch lands. Final table = seed + valid
    * batch; customer keys are unique, so the fixture satisfies the
    * index by construction. */
  private def hm6(s: SparkSession, d: String): DataFrame = {
    val st = new TableStore(s,
      Files.createTempDirectory("graft-hql-uniq-").toString)
    def batch(m: Int) = t(s, d, "customer")
      .filter(col("c_custkey") % 10 === m)
      .select(col("c_custkey").cast("string").as("student"),
        expr("CAST(floor(c_acctbal) AS INT)").as("score"))
    st.create("Roster", batch(0))
    HeroQL.executeMutation(uniqueProgram, "Enroll", batch(1), st)
    def mustReject(rows: DataFrame): Unit =
      try {
        HeroQL.executeMutation(uniqueProgram, "Enroll", rows, st)
        throw new IllegalStateException("unique violation must reject")
      } catch { case _: graft.heroql.Analyzer.AnalysisError => () }
    mustReject(batch(1)) // repeats committed students
    mustReject(batch(2).unionAll(batch(2))) // batch-internal duplicate
    st.read("Roster")
  }

  private val procedureProgram = """
data Exams(student: string, score: int).
data Honors(student: string, score: int).
data Bonus(student: string, amount: int).

procedure Graduate(cutoff: int64, bonus: int64) {
    Exams(student, score), score > cutoff, @insert Honors(student, score);
    Honors(student, score), b <- score + bonus, @insert Bonus(student, b);
    Exams(student, score), score > cutoff, @remove Exams(student, score);
}
"""

  /** hm7 — `procedure Name(args) { stmt; stmt; }` (the reference's
    * reserved procedure form, `Kernel/README.md:9,20`): three
    * statements with read-your-writes — statement 2 derives Bonus from
    * the Honors rows statement 1 JUST inserted (an empty Bonus proves
    * RYW broke), statement 3 removes the promoted Exams rows — all in
    * ONE atomic commit, parameters substituted as readonly constants.
    * Result = all three tables tagged; the oracle states the same
    * three-way split relationally. */
  private def hm7(s: SparkSession, d: String): DataFrame = {
    val st = scratch(s, d)
    HeroQL.executeProcedure(procedureProgram, "Graduate",
      Map("cutoff" -> 300000L, "bonus" -> 1000L), st)
    st.read("Exams").withColumn("bucket", lit("live"))
      .unionByName(st.read("Honors").withColumn("bucket", lit("honors")))
      .unionByName(st.read("Bonus")
        .select(col("student"), col("amount").as("score"))
        .withColumn("bucket", lit("bonus")))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "hm7_procedure" -> (hm7 _),
    "hm1_hql_insert" -> (hm1 _),
    "hm2_hql_update" -> (hm2 _),
    "hm3_hql_remove" -> (hm3 _),
    "hm8_remove_mor" -> (hm8 _),
    "hm4_transaction_let" -> (hm4 _),
    "hm5_for_set" -> (hm5 _),
    "hm6_unique_index" -> (hm6 _),
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
    "hm8_remove_mor" ->
      s"""SELECT student, score FROM ($seedSql)
         WHERE student NOT IN (
           SELECT DISTINCT CAST(o_custkey AS VARCHAR)
           FROM orders WHERE o_orderkey % 10 = 0 AND o_orderpriority = '5-LOW')""",
    "hm3_hql_remove" ->
      s"""SELECT student, score FROM ($seedSql)
         WHERE student NOT IN (
           SELECT DISTINCT CAST(o_custkey AS VARCHAR)
           FROM orders WHERE o_orderkey % 10 = 0 AND o_orderpriority = '5-LOW')""",
    // rows with score > 300000 move from Exams to Honors atomically; a
    // live row is exactly a seed row that is not high (removal keys are
    // (student, score) pairs, and any seed row equal to a high pair is
    // itself high)
    "hm4_transaction_let" ->
      s"""SELECT student, score, 'live' AS bucket FROM ($seedSql)
         WHERE NOT score > 300000
         UNION ALL
         SELECT student, score, 'honors' AS bucket FROM ($seedSql)
         WHERE score > 300000""",
    "hm5_for_set" ->
      s"""SELECT student, score + 1000 AS amount FROM ($seedSql)
         WHERE score > 300000""",
    // high rows move to honors (with a bonus row each), the rest stay
    // live — the b <- score + bonus binding lands as amount
    "hm7_procedure" ->
      s"""SELECT student, score, 'live' AS bucket FROM ($seedSql)
         WHERE NOT score > 300000
         UNION ALL
         SELECT student, score, 'honors' AS bucket FROM ($seedSql)
         WHERE score > 300000
         UNION ALL
         SELECT student, score + 1000 AS score, 'bonus' AS bucket
         FROM ($seedSql) WHERE score > 300000""",
    // seed (%10 = 0) + the admitted batch (%10 = 1); both rejected
    // batches must leave no trace
    "hm6_unique_index" ->
      """SELECT CAST(c_custkey AS VARCHAR) AS student,
                CAST(floor(c_acctbal) AS INTEGER) AS score
         FROM customer WHERE c_custkey % 10 IN (0, 1)""",
  )
}
