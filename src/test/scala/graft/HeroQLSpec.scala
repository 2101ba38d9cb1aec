package graft

import graft.heroql.{Analyzer, Ast, HeroQL, Parser}
import graft.queries.HeroQueries
import org.scalatest.funsuite.AnyFunSuite

/** Golden parser tests over the reference's own samples
  * (`Kernel/README.md:107-205` transcribed in FIXTURES.md) plus the
  * mode-analysis negative cases the reference calls out
  * (`Kernel/README.md:136-137` "cannot run backward"). */
class HeroQLParserSpec extends AnyFunSuite {
  import Ast._

  test("golden: Top10 sample parses to the expected AST") {
    val p = Parser.parse(
      """data Exams(student: string, score: int).
        |query Top10() -> (student: string, score: int)
        |:- Exams(student, score),
        |   order <- @order_by_desc(score),
        |   order < 10
        |.""".stripMargin)
    assert(p.datas == Seq(DataDecl("Exams",
      Seq("student" -> "string", "score" -> "int"))))
    val q = p.queries.head
    assert(q.name == "Top10" && q.inArgs.isEmpty)
    assert(q.outArgs == Seq("student" -> "string", "score" -> "int"))
    assert(q.body.alts.size == 1)
    assert(q.body.alts.head.items == Seq(
      Atom("Exams", Seq(TVar("student"), TVar("score"))),
      RankBinding("order", EVar("score"), desc = true),
      Compare("<", EVar("order"), ELit(LInt(10)))))
  }

  test("golden: disjunction rule parses as two alternatives") {
    val p = Parser.parse(
      """data Father(father: int64, child: int64).
        |data Mother(mother: int64, child: int64).
        |query Parents(parent: int64, child: int64)
        |:- Father(parent, child)
        |;  Mother(parent, child)
        |.""".stripMargin)
    val q = p.queries.head
    assert(q.body.alts == Seq(
      Conj(Seq(Atom("Father", Seq(TVar("parent"), TVar("child"))))),
      Conj(Seq(Atom("Mother", Seq(TVar("parent"), TVar("child")))))))
  }

  test("golden: the full HeroQueries program parses (9 queries + 1 func)") {
    val p = Parser.parse(HeroQueries.program)
    assert(p.datas.size == 5)
    assert(p.queries.map(_.name) == Seq("Top10", "Top3PerStudent", "AvgTop3",
      "Parents", "GrandParents", "GrandParentsSub", "Quad", "Childless", "Graded"))
    assert(p.funcs.map(_.name) == Seq("Grade"))
    assert(p.funcs.head.cases.size == 3)
  }

  test("mode analysis rejects running a binding backward") {
    val p = Parser.parse(
      """data T(x: int).
        |query Bad(x: int) -> (x2: int)
        |:- T(x), x <- x2 * x2
        |.""".stripMargin)
    val e = intercept[Analyzer.AnalysisError] {
      Analyzer.analyze(p.datas.map(d => d.name -> d).toMap, Map.empty, p.queries.head)
    }
    assert(e.getMessage.contains("cannot run backward"))
  }

  test("mode analysis rejects rebinding a bound variable") {
    val p = Parser.parse(
      """data T(x: int).
        |query Bad(x: int)
        |:- T(x), x <- 1 + 2
        |.""".stripMargin)
    val e = intercept[Analyzer.AnalysisError] {
      Analyzer.analyze(p.datas.map(d => d.name -> d).toMap, Map.empty, p.queries.head)
    }
    assert(e.getMessage.contains("cannot run backward"))
  }

  test("planner rejects recursive rules with the calculating guard") {
    val src =
      """data E(a: int64, b: int64).
        |query Reach(a: int64, b: int64)
        |:- E(a, b)
        |;  E(a, m), Reach(m, b)
        |.""".stripMargin
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val e = intercept[Analyzer.AnalysisError] {
      HeroQL.compile(src, "Reach",
        Map("E" -> Seq((1L, 2L)).toDF("a", "b"))).collect()
    }
    assert(e.getMessage.contains("calculating"))
  }
}
