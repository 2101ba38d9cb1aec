package graft

import org.apache.spark.sql.functions._

/** Exhaustive join-type × null-key matrix — the reference's strongest
  * test idea generalized (its lock tests enumerate the full 6×6
  * compatibility matrix against a duplicated expected table,
  * `Kernel/UnitTest/TestUtility_Lock.cpp:101-197`; SURVEY §5 point 3).
  * Fixture: left keys {1, 2, null}, right keys {2, 3, null} — null keys
  * must never match in any join type. */
class JoinMatrixSpec extends SparkSpec {

  private lazy val left = {
    import spark.implicits._
    Seq((Option(1L), "a"), (Option(2L), "b"), (Option.empty[Long], "n"))
      .toDF("k", "lv")
  }
  private lazy val right = {
    import spark.implicits._
    Seq((Option(2L), "x"), (Option(3L), "y"), (Option.empty[Long], "z"))
      .toDF("k2", "rv")
  }

  // joinType -> (expected row count, expected matched-key set)
  private val expected: Seq[(String, Long, Set[Option[Long]])] = Seq(
    ("inner", 1L, Set(Some(2L))),
    ("left_outer", 3L, Set(Some(1L), Some(2L), None)),
    ("right_outer", 3L, Set(Some(2L), Some(3L), None)),
    ("full_outer", 5L, Set(Some(1L), Some(2L), Some(3L), None)),
    ("left_semi", 1L, Set(Some(2L))),
    ("left_anti", 2L, Set(Some(1L), None)),
  )

  expected.foreach { case (joinType, count, keys) =>
    test(s"join matrix: $joinType with null keys") {
      val joined = left.join(right, left("k") === right("k2"), joinType)
      assert(joined.count() == count, s"$joinType row count")
      val keyCol = joinType match {
        case "right_outer" => col("k2")
        case "full_outer" => coalesce(col("k"), col("k2"))
        case _ => col("k")
      }
      val got = joined.select(keyCol).collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSet
      assert(got == keys, s"$joinType keys: got $got, want $keys")
    }
  }

  test("null-safe equality (<=>) DOES match null keys, unlike ===") {
    val nsafe = left.join(right, left("k") <=> right("k2"), "inner")
    assert(nsafe.count() == 2) // (2,2) and (null,null)
  }

  test("salted skew join equals the plain equi-join, and the salt reaches the shuffle") {
    import spark.implicits._
    // heavy skew: 90% of facts share key 1
    val facts = (1 to 1000).map(i => (if (i <= 900) 1L else (i % 7).toLong, i.toLong))
      .toDF("k", "v")
    val dim = Seq((0L, "z"), (1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"),
      (5L, "e"), (6L, "f")).toDF("k", "label")
    val plain = facts.join(dim, "k")
      .select("k", "v", "label").collect().map(_.toSeq).toSet
    val saltedDf = graft.operators.SkewJoin.salted(facts, dim, "k", salt = 4)
    val salted = saltedDf.select("k", "v", "label").collect().map(_.toSeq).toSet
    assert(salted == plain)
    // the exchange must partition on (k, __salt), not k alone
    val plan = saltedDf.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"salt column missing from plan:\n$plan")
  }
}
