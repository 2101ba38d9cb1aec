package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** Pointwise semantics of [[AsOfJoin.asOfMatch]] on a hand-built
  * fixture — direction, tolerance, exact-ts ties, duplicate right rows,
  * unmatched lefts, and null right values (row semantics: the matched
  * row's null value is KEPT, not skipped). The j9b driver gate checks
  * the events-table instance against DuckDB; this pins the corners the
  * fixture data may not contain.
  */
class AsOfJoinSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  // left: (id, key, t); right: (key, t, v). Integer "timestamps" keep
  // the arithmetic exact and the tolerance a plain literal.
  private lazy val left: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "a", 10L), // between right rows at 5 and 20
      (2L, "a", 5L),  // exact tie with right at 5
      (3L, "a", 1L),  // before all right rows
      (4L, "a", 50L), // after all right rows
      (5L, "b", 10L), // key with a single right row far away (t=100)
      (6L, "c", 10L)  // key absent from right entirely
    ).toDF("id", "key", "t")
  }

  private lazy val right: DataFrame = {
    import spark.implicits._
    Seq(
      ("a", 5L, 1.0),
      ("a", 5L, 3.0),  // duplicate (key, ts): collapses to max = 3.0
      ("a", 20L, 7.0),
      ("b", 100L, 9.0)
    ).toDF("key", "t", "v")
  }

  private def rows(df: DataFrame): Map[Long, (Option[Long], Option[Double])] =
    df.collect().map { r =>
      r.getAs[Long]("id") ->
        ((if (r.isNullAt(r.fieldIndex("asof_ts"))) None
          else Some(r.getAs[Long]("asof_ts"))),
          (if (r.isNullAt(r.fieldIndex("asof_v"))) None
           else Some(r.getAs[Double]("asof_v"))))
    }.toMap

  test("backward: latest right at or before, ties inclusive, dup rows collapsed to max") {
    val got = rows(AsOfJoin.asOfMatch(left, right, "key", "t", "v"))
    assert(got(1L) == (Some(5L), Some(3.0)))   // 5 <= 10 < 20
    assert(got(2L) == (Some(5L), Some(3.0)))   // exact tie matches
    assert(got(3L) == (None, None))            // nothing at or before 1
    assert(got(4L) == (Some(20L), Some(7.0)))  // latest overall
    assert(got(5L) == (None, None))            // b's only row is later
    assert(got(6L) == (None, None))            // key never on the right
  }

  test("forward: earliest right at or after, ties inclusive") {
    val got = rows(AsOfJoin.asOfMatch(left, right, "key", "t", "v", forward = true))
    assert(got(1L) == (Some(20L), Some(7.0)))  // next after 10
    assert(got(2L) == (Some(5L), Some(3.0)))   // exact tie matches forward too
    assert(got(3L) == (Some(5L), Some(3.0)))
    assert(got(4L) == (None, None))            // nothing after 50
    assert(got(5L) == (Some(100L), Some(9.0)))
    assert(got(6L) == (None, None))
  }

  test("tolerance nulls the nearest match when too far — never substitutes a farther row") {
    val back = rows(AsOfJoin.asOfMatch(left, right, "key", "t", "v",
      tolerance = Some(lit(4L))))
    assert(back(1L) == (None, None))           // nearest is 5, gap 5 > 4
    assert(back(2L) == (Some(5L), Some(3.0)))  // gap 0
    assert(back(4L) == (None, None))           // gap 30 > 4
    val fwd = rows(AsOfJoin.asOfMatch(left, right, "key", "t", "v",
      forward = true, tolerance = Some(lit(15L))))
    assert(fwd(1L) == (Some(20L), Some(7.0)))  // gap 10 <= 15
    assert(fwd(5L) == (None, None))            // gap 90 > 15
  }

  test("a matched row's null value is kept as the match (row semantics, not skip-null)") {
    import spark.implicits._
    val r2 = Seq(("a", 5L, Some(1.0)), ("a", 20L, None: Option[Double]))
      .toDF("key", "t", "v")
    val probe = Seq((1L, "a", 30L)).toDF("id", "key", "t")
    val got = rows(AsOfJoin.asOfMatch(probe, r2, "key", "t", "v"))
    // nearest row (t=20) matched; its null value emitted, NOT 1.0
    assert(got(1L) == (Some(20L), None))
  }

  test("null timestamps: a null-ts right row is never a match; a null-ts left row is unmatched") {
    import spark.implicits._
    val r2 = Seq(("a", Some(5L), 9.0), ("a", None: Option[Long], 99.0))
      .toDF("key", "t", "v")
    val l2 = Seq((1L, "a", Some(10L)), (2L, "a", None: Option[Long]))
      .toDF("id", "key", "t")
    Seq(false, true).foreach { fwd =>
      val got = rows(AsOfJoin.asOfMatch(l2, r2, "key", "t", "v", forward = fwd))
      // the null-ts right row (value 99.0) must never surface
      assert(!got.values.exists(_._2.contains(99.0)), s"fwd=$fwd: $got")
      // the null-ts left row matches nothing in either direction
      assert(got(2L) == (None, None), s"fwd=$fwd: $got")
      // the real rows still match normally
      assert(got(1L) == (if (fwd) (None, None) else (Some(5L), Some(9.0))),
        s"fwd=$fwd: $got")
    }
  }

  test("asOfMatch plans one exchange on the key (direction does not add a shuffle)") {
    Seq(false, true).foreach { fwd =>
      val p = AsOfJoin.asOfMatch(left, right, "key", "t", "v", forward = fwd)
        .queryExecution.executedPlan.toString
      val exchanges = "hashpartitioning\\(key".r.findAllIn(p).length
      assert(exchanges >= 1 && p.contains("Window"), s"unexpected plan:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
        s"as-of must never enumerate pairs:\n$p")
    }
  }
}
