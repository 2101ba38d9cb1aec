package graft

import org.apache.spark.sql.functions._
import graft.operators.Fixpoint

/** Seeded randomized property tests (SURVEY §5 point 4): algebraic laws
  * over generated inputs — union commutativity up to bag equality,
  * filter/projection commutation (the pushdown-safety law Catalyst
  * relies on), and fixpoint closure vs a driver-side reference
  * implementation on random DAGs. */
class PropertySpec extends SparkSpec {

  private val rnd = new scala.util.Random(2026)

  private def randomDf(n: Int) = {
    import spark.implicits._
    Seq.fill(n)((rnd.nextInt(10).toLong, rnd.nextInt(100))).toDF("k", "v")
  }

  test("property: union is commutative up to bag equality (20 cases)") {
    (1 to 20).foreach { _ =>
      val (a, b) = (randomDf(rnd.nextInt(30) + 1), randomDf(rnd.nextInt(30) + 1))
      val ab = a.union(b).groupBy("k", "v").count()
      val ba = b.union(a).groupBy("k", "v").count()
      assert(ab.except(ba).isEmpty && ba.except(ab).isEmpty)
    }
  }

  test("property: filter commutes with projection (20 cases)") {
    (1 to 20).foreach { _ =>
      val df = randomDf(rnd.nextInt(50) + 1)
      val cut = rnd.nextInt(100)
      val a = df.filter(col("v") > cut).select("k")
      val b = df.select("k", "v").filter(col("v") > cut).select("k")
      assert(a.groupBy("k").count().except(b.groupBy("k").count()).isEmpty)
    }
  }

  test("property: sortableDoubleBits preserves engine double order (2000 cases incl NaN, ±0.0, ±Inf, subnormals)") {
    val r = new scala.util.Random(7)
    def gen(): Double = r.nextInt(6) match {
      case 0 => r.nextDouble() * 2 - 1
      case 1 => (r.nextDouble() * 2 - 1) * 1e300
      case 2 => (r.nextDouble() * 2 - 1) * 1e-300
      case 3 => if (r.nextBoolean()) 0.0 else -0.0
      case 4 => if (r.nextBoolean()) Double.PositiveInfinity
                else Double.NegativeInfinity
      case 5 => java.lang.Double.longBitsToDouble(r.nextLong()) // any bits
    }
    (1 to 2000).foreach { _ =>
      val (a, b) = (gen(), gen())
      val (ba, bb) = (graft.store.ZoneMaps.sortableDoubleBits(a),
        graft.store.ZoneMaps.sortableDoubleBits(b))
      if (a.isNaN && b.isNaN) () // payloads canonicalize; no order claim
      else if (a.isNaN) assert(ba > bb, s"NaN must sit above $b")
      else if (b.isNaN) assert(bb > ba, s"NaN must sit above $a")
      else {
        // engine semantics: < and == (±0.0 compare EQUAL) must survive
        // the encoding exactly — this is what makes interval
        // disjointness in bits space equal disjointness in value space
        assert((a < b) == (ba < bb), s"order broke: $a vs $b")
        assert((a == b) == (ba == bb), s"equality broke: $a vs $b")
      }
    }
  }

  test("property: fixpoint closure equals driver-side reference on random DAGs (10 cases)") {
    import spark.implicits._
    (1 to 10).foreach { _ =>
      // acyclic by construction: edges only low -> high
      val edges = (0 until (rnd.nextInt(20) + 5)).map { _ =>
        val a = rnd.nextInt(12)
        val b = a + 1 + rnd.nextInt(4)
        (a.toLong, b.toLong)
      }.distinct
      val df = edges.toDF("child", "parent")
      val got = Fixpoint.transitiveClosure(df)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // reference: BFS over the edge list
      val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      def reach(x: Long): Set[Long] = {
        var seen = Set.empty[Long]
        var frontier = adj.getOrElse(x, Set.empty)
        while (frontier.nonEmpty) {
          seen ++= frontier
          frontier = frontier.flatMap(f => adj.getOrElse(f, Set.empty)) -- seen
        }
        seen
      }
      val want = edges.map(_._1).distinct
        .flatMap(c => reach(c).map(c -> _)).toSet
      assert(got == want, s"closure mismatch: extra=${got -- want} missing=${want -- got}")
    }
  }

  test("property: doubling and semi-naive closures agree (5 cases)") {
    import spark.implicits._
    (1 to 5).foreach { _ =>
      val edges = (0 until (rnd.nextInt(15) + 5)).map { _ =>
        val a = rnd.nextInt(10)
        (a.toLong, (a + 1 + rnd.nextInt(3)).toLong)
      }.distinct.toDF("child", "parent")
      val a = Fixpoint.transitiveClosure(edges)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val b = Fixpoint.transitiveClosureDoubling(edges)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(a == b)
    }
  }

  test("property: asOfMatch equals a driver-side reference on random series (10 cases)") {
    import spark.implicits._
    (1 to 10).foreach { _ =>
      val left = Seq.tabulate(rnd.nextInt(25) + 5)(i =>
        (i.toLong, rnd.nextInt(4).toLong, rnd.nextInt(50).toLong))
      val right = Seq.fill(rnd.nextInt(25) + 5)(
        (rnd.nextInt(4).toLong, rnd.nextInt(50).toLong, rnd.nextInt(100).toDouble))
      val forward = rnd.nextBoolean()
      val tol = if (rnd.nextBoolean()) Some(rnd.nextInt(20).toLong) else None
      // reference: collapse dup (key, ts) to max(value), then pick the
      // nearest at-or-before / at-or-after row, nulled outside tolerance
      val collapsed = right.groupBy(r => (r._1, r._2))
        .map { case ((k, t), rs) => (k, t, rs.map(_._3).max) }.toSeq
      val want = left.map { case (id, k, t) =>
        val side = collapsed.filter(r => r._1 == k &&
          (if (forward) r._2 >= t else r._2 <= t))
        val m = if (side.isEmpty) None
          else Some(if (forward) side.minBy(_._2) else side.maxBy(_._2))
        val ok = m.exists(r => tol.forall(tl =>
          (if (forward) r._2 - t else t - r._2) <= tl))
        id -> (if (ok) Some((m.get._2, m.get._3)) else None)
      }.toMap
      val got = graft.operators.AsOfJoin.asOfMatch(
        left.toDF("id", "key", "t"), right.toDF("key", "t", "v"),
        "key", "t", "v", forward = forward, tolerance = tol.map(lit(_)))
        .collect().map { r =>
          r.getAs[Long]("id") ->
            (if (r.isNullAt(r.fieldIndex("asof_ts"))) None
             else Some((r.getAs[Long]("asof_ts"), r.getAs[Double]("asof_v"))))
        }.toMap
      assert(got == want, s"forward=$forward tol=$tol:\n got=$got\nwant=$want")
    }
  }

  test("property: PII redaction is idempotent and match-free (20 cases)") {
    import spark.implicits._
    import graft.operators.TextFns
    // random words with PII fragments spliced at random offsets
    def word() = Seq.fill(rnd.nextInt(6) + 1)(('a' + rnd.nextInt(26)).toChar).mkString
    def piis() = rnd.nextInt(3) match {
      case 0 => s"${word()}@${word()}.com"
      case 1 => s"${rnd.nextInt(256)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}"
      case _ => f"+1-555-${rnd.nextInt(10000)}%04d"
    }
    val texts = (1 to 20).map { i =>
      (i.toLong, (1 to rnd.nextInt(8) + 2).map(_ =>
        if (rnd.nextBoolean()) word() else piis()).mkString(" "))
    }.toDF("id", "text")
    val once = TextFns.redactPii(col("text"))
    val out = texts.select(
      once.as("r1"),
      TextFns.redactPii(once).as("r2")).collect()
    out.foreach { r =>
      // idempotent: the replacement tokens never re-match any pattern
      assert(r.getString(0) == r.getString(1),
        s"redact not idempotent: '${r.getString(0)}' vs '${r.getString(1)}'")
      assert(!r.getString(0).contains("@"), s"email residue: ${r.getString(0)}")
    }
  }

  test("property: SimHash is invariant under token order (10 cases)") {
    import spark.implicits._
    import graft.operators.TextFns
    // the sign-fold sums PER-TOKEN hashes — a bag property, so any
    // permutation of the tokens must produce the identical signature
    val rows = (1 to 10).map { i =>
      val toks = Seq.fill(rnd.nextInt(20) + 3)(
        Seq.fill(rnd.nextInt(5) + 1)(('a' + rnd.nextInt(26)).toChar).mkString)
      (i.toLong, toks.mkString(" "), rnd.shuffle(toks).mkString(" "))
    }.toDF("id", "fwd", "shuf")
    rows.select(
      TextFns.simhashOf(col("fwd")).as("a"),
      TextFns.simhashOf(col("shuf")).as("b")).collect()
      .foreach { r =>
        assert(r.getLong(0) == r.getLong(1),
          "simhash changed under token permutation")
      }
  }

  test("property: BFS distances equal driver-side Dijkstra on random cyclic graphs (5 cases)") {
    import spark.implicits._
    (1 to 5).foreach { _ =>
      // cycles allowed: edges in both directions over a small node set,
      // so the anti-join re-admission guard is exercised, and unit
      // weights make BFS layering the min-dist semantics
      val edges = (0 until (rnd.nextInt(40) + 15)).map { _ =>
        (rnd.nextInt(14).toLong, rnd.nextInt(14).toLong)
      }.filter(e => e._1 != e._2).distinct
      val df = edges.toDF("child", "parent")
      val got = Fixpoint.bfsDistances(df, source = 0L)
        .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      // reference: BFS from 0 following parent -> child
      val adj = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
      var dist = Map(0L -> 0)
      var frontier = List(0L)
      var d = 0
      while (frontier.nonEmpty) {
        d += 1
        val next = frontier.flatMap(n => adj.getOrElse(n, Nil))
          .filterNot(dist.contains).distinct
        dist ++= next.map(_ -> d)
        frontier = next
      }
      assert(got == dist, s"extra=${got.toSet -- dist.toSet} missing=${dist.toSet -- got.toSet}")
    }
  }

  test("property: planner semi-naive fixpoint equals the Scala closure on random cyclic graphs (5 cases)") {
    import spark.implicits._
    // the language-surface evaluator (hq21's path) must agree with the
    // dedicated Fixpoint operator on arbitrary graphs — cycles included,
    // so the except()-based convergence test is what terminates the loop
    val src =
      """data E(child: int64, parent: int64).
        |query Reach(child: int64, anc: int64)
        |:- E(child, anc)
        |;  E(child, mid), Reach(mid, anc)
        |.""".stripMargin
    (1 to 5).foreach { _ =>
      val edges = (0 until (rnd.nextInt(35) + 10)).map { _ =>
        (rnd.nextInt(12).toLong, rnd.nextInt(12).toLong)
      }.filter(e => e._1 != e._2).distinct.toDF("child", "parent")
      val a = graft.heroql.HeroQL.compile(src, "Reach", Map("E" -> edges))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val b = Fixpoint.transitiveClosure(edges)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(a == b, s"extra=${a -- b} missing=${b -- a}")
    }
  }

  test("property: demand-seeded fixpoint equals full-closure-then-filter on random cyclic graphs (5 cases)") {
    import spark.implicits._
    // the seeded slice must be exactly the full closure restricted to
    // the demanded constant — on arbitrary graphs, cycles included
    val src =
      """data E(a: int64, b: int64).
        |query Reach(a: int64, b: int64)
        |:- E(a, b)
        |;  E(a, m), Reach(m, b)
        |.
        |query Into(a: int64)
        |:- Reach(a, 5)
        |.""".stripMargin
    (1 to 5).foreach { _ =>
      val edges = (0 until (rnd.nextInt(35) + 10)).map { _ =>
        (rnd.nextInt(12).toLong, rnd.nextInt(12).toLong)
      }.filter(e => e._1 != e._2).distinct.toDF("child", "parent")
      val e = edges.select(col("child").as("a"), col("parent").as("b"))
      val seeded = graft.heroql.HeroQL.compile(src, "Into", Map("E" -> e))
        .collect().map(_.getLong(0)).toSet
      assert(graft.heroql.Planner.lastFixpointDemand.nonEmpty, "seed did not engage")
      val full = graft.heroql.HeroQL.compile(src, "Reach", Map("E" -> e))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = full.collect { case (a, b) if b == 5L => a }
      assert(seeded == want, s"extra=${seeded -- want} missing=${want -- seeded}")
    }
  }

  test("property: magic-sets fixpoint equals full-closure-then-filter on random cyclic graphs (5 cases)") {
    import spark.implicits._
    // demand at the NON-invariant position (the self-atom carries m,
    // not the head's a) routes through the magic-sets restriction —
    // the restricted loop must still produce exactly the full closure's
    // demanded slice, on arbitrary graphs, cycles included
    val src =
      """data E(a: int64, b: int64).
        |query Reach(a: int64, b: int64)
        |:- E(a, b)
        |;  E(a, m), Reach(m, b)
        |.
        |query From(b: int64)
        |:- Reach(3, b)
        |.""".stripMargin
    (1 to 5).foreach { _ =>
      val edges = (0 until (rnd.nextInt(35) + 10)).map { _ =>
        (rnd.nextInt(12).toLong, rnd.nextInt(12).toLong)
      }.filter(e => e._1 != e._2).distinct.toDF("child", "parent")
      val e = edges.select(col("child").as("a"), col("parent").as("b"))
      val restricted = graft.heroql.HeroQL.compile(src, "From", Map("E" -> e))
        .collect().map(_.getLong(0)).toSet
      assert(graft.heroql.Planner.lastFixpointDemand == Seq("a"),
        s"magic restriction did not engage: ${graft.heroql.Planner.lastFixpointDemand}")
      val full = graft.heroql.HeroQL.compile(src, "Reach", Map("E" -> e))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = full.collect { case (a, b) if a == 3L => b }
      assert(restricted == want,
        s"extra=${restricted -- want} missing=${want -- restricted}")
    }
  }

  test("magic sets: an atom included on a second propagation pass joins, not cross-products") {
    import spark.implicits._
    // E2 precedes E in the body but shares no variable with the bound
    // head field until E binds m — the magic rule plans it in INCLUSION
    // order (after E), so it joins on m instead of cross-joining, and
    // its constraint still prunes the magic frontier
    val src =
      """data E(a: int64, b: int64).
        |data E2(m: int64, z: int64).
        |query Reach(a: int64, b: int64)
        |:- E(a, b)
        |;  E2(m, z), E(a, m), Reach(m, b)
        |.
        |query From(b: int64)
        |:- Reach(1, b)
        |.""".stripMargin
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 8L)).toDF("a", "b")
    val e2 = Seq((2L, 1L)).toDF("m", "z") // only m=2 may recurse
    val from = graft.heroql.HeroQL.compile(src, "From", Map("E" -> e, "E2" -> e2))
      .collect().map(_.getLong(0)).toSet
    assert(graft.heroql.Planner.lastFixpointDemand == Seq("a"),
      s"magic restriction did not engage: ${graft.heroql.Planner.lastFixpointDemand}")
    val full = graft.heroql.HeroQL.compile(src, "Reach", Map("E" -> e, "E2" -> e2))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val want = full.collect { case (a, b) if a == 1L => b }
    assert(from == want, s"extra=${from -- want} missing=${want -- from}")
    assert(from == Set(2L, 3L), s"got $from")
  }

  test("magic sets: wildcard at the demanded self-atom position falls back to full evaluation") {
    import spark.implicits._
    // Reach(_, b) recurses with the demanded position unconstrained —
    // magic cannot represent "all values"; the restriction must refuse
    // and the full loop must still answer correctly
    val src =
      """data E(a: int64, b: int64).
        |query Reach(a: int64, b: int64)
        |:- E(a, b)
        |;  E(a, _), Reach(_, b)
        |.
        |query From(b: int64)
        |:- Reach(1, b)
        |.""".stripMargin
    val e = Seq((1L, 2L), (5L, 6L)).toDF("a", "b")
    val from = graft.heroql.HeroQL.compile(src, "From", Map("E" -> e))
      .collect().map(_.getLong(0)).toSet
    assert(graft.heroql.Planner.lastFixpointDemand.isEmpty,
      "wildcard self-atom argument must refuse the magic restriction")
    // every edge target is reachable from 1: the wildcard self-atom
    // admits any accumulated tuple regardless of origin
    assert(from == Set(2L, 6L), s"got $from")
  }

  test("magic sets: two recursive alternatives both feed the magic closure") {
    import spark.implicits._
    // forward and backward step rules: the magic set must close over
    // BOTH sideways rules or the restricted loop starves one direction
    val src =
      """data E(a: int64, b: int64).
        |data R(a: int64, b: int64).
        |query Reach(a: int64, b: int64)
        |:- E(a, b)
        |;  E(a, m), Reach(m, b)
        |;  R(m, a), Reach(m, b)
        |.
        |query From(b: int64)
        |:- Reach(1, b)
        |.""".stripMargin
    val e = Seq((1L, 2L), (2L, 3L), (9L, 4L)).toDF("a", "b")
    val r = Seq((5L, 1L), (6L, 5L)).toDF("a", "b") // R(m, a): 1→5→6
    val from = graft.heroql.HeroQL.compile(src, "From", Map("E" -> e, "R" -> r))
      .collect().map(_.getLong(0)).toSet
    assert(graft.heroql.Planner.lastFixpointDemand == Seq("a"),
      s"magic restriction did not engage: ${graft.heroql.Planner.lastFixpointDemand}")
    // closure from 1: E-steps 2, 3; R-steps route through 5 then 6,
    // whose E-bases are empty, contributing their E-reach (none) — but
    // Reach(5, b) needs base E(5, ·): none; R(5,1) gives Reach(1,b) via
    // Reach(5,b)... verify against the unrestricted evaluation instead
    val full = graft.heroql.HeroQL.compile(src, "Reach", Map("E" -> e, "R" -> r))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val want = full.collect { case (a, b) if a == 1L => b }
    assert(from == want, s"extra=${from -- want} missing=${want -- from}")
  }

  test("property: functional pointer-doubling closure agrees on forests (5 cases)") {
    import spark.implicits._
    (1 to 5).foreach { _ =>
      // functional: each child has EXACTLY one parent (a random forest),
      // deep chains included so multiple doubling rounds are exercised
      val edges = (1 to (rnd.nextInt(30) + 20)).map { c =>
        (c.toLong + 100, (rnd.nextInt(c) + 100).toLong) // parent id < child id
      }.toDF("child", "parent")
      val a = Fixpoint.transitiveClosure(edges)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val b = Fixpoint.transitiveClosureFunctional(edges)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(a == b, s"extra=${b -- a} missing=${a -- b}")
    }
  }

  test("property: segment-tree range aggregates equal a driver-side reference (10 cases)") {
    import spark.implicits._
    (1 to 10).foreach { _ =>
      // clustered timestamps (duplicates and gaps), NULL-bearing
      // values, random window widths — the canonical-decomposition
      // arithmetic's edge surface: misaligned boundaries, sub-leaf
      // windows, out-of-span probes
      val n = rnd.nextInt(120) + 30
      val build = (1 to n).map { _ =>
        val ts = rnd.nextInt(2000).toLong * (rnd.nextInt(3) + 1)
        val v = if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(200).toLong - 100)
        (ts, v)
      }
      val probes = (1 to rnd.nextInt(40) + 10).map(i =>
        (i.toLong, rnd.nextInt(5000).toLong - 500))
      val w = rnd.nextInt(300).toLong + 1
      val got = graft.operators.RangeCount.rangeAggAll(
          probes.toDF("pid", "t0"), build.toDF("tns", "v"),
          "pid", "t0", "tns", Some("v"), w,
          targetLeafRows = rnd.nextInt(8) + 1)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2),
            if (r.isNullAt(3)) None else Some(r.getLong(3)),
            if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
      val want = probes.flatMap { case (pid, t0) =>
        val in = build.filter { case (ts, _) => ts >= t0 && ts < t0 + w }
        if (in.isEmpty) None else {
          val vs = in.flatMap(_._2)
          Some(pid -> ((in.size.toLong, vs.sum,
            vs.minOption, vs.maxOption)))
        }
      }.toMap
      assert(got == want,
        s"window=$w extra=${got.keySet -- want.keySet} missing=${want.keySet -- got.keySet} " +
          s"diff=${got.collect { case (k, v) if want.get(k).exists(_ != v) => k -> (v, want(k)) }}")
    }
  }
}
