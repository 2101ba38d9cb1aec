package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.operators.{Fixpoint, GraphOps}

/** Graph-relation operators (SURVEY §2.3 J6/J7, §1.1 relationship
  * fields) — recursive rules via the semi-naïve fixpoint driver, and
  * analytical graph algorithms via GraphX (BASELINE.json north star).
  *
  * Two derived edge sets over the test warehouse:
  *  - the part hierarchy: child k → parent k div 2 (a binary tree, depth
  *    log₂ n — exercises multi-round recursion);
  *  - the nation co-region graph: nations sharing a region (5 cliques —
  *    known components for the CC oracle).
  */
object GraphQueries extends QueryPack {

  private def partEdges(s: SparkSession, d: String): DataFrame =
    t(s, d, "part")
      .select(col("p_partkey").as("child"), expr("p_partkey div 2").as("parent"))
      .filter(col("parent") >= 1)

  private def nationEdges(s: SparkSession, d: String): DataFrame = {
    val n1 = t(s, d, "nation").select(col("n_nationkey").as("src"), col("n_regionkey").as("rk"))
    val n2 = t(s, d, "nation").select(col("n_nationkey").as("dst"), col("n_regionkey").as("rk2"))
    n1.join(n2, col("rk") === col("rk2") && col("src") < col("dst"))
      .select("src", "dst")
  }

  /** g1/J7 — recursive query (transitive closure of the part hierarchy)
    * via semi-naïve fixpoint (`Kernel/README.md:158-161` recursion
    * guard; no WITH RECURSIVE in Spark). */
  private def g1(s: SparkSession, d: String): DataFrame =
    // the part hierarchy is an n..1 relationship (every child has one
    // parent), so the closure uses pointer doubling on the parent
    // FUNCTION — each closure pair produced exactly once, no dedup
    Fixpoint.transitiveClosureFunctional(partEdges(s, d))

  /** g2 — connected components on the nation co-region graph
    * (components are exactly the regions), through the all-DataFrame
    * large-star/small-star resolver — the production CC path
    * (GraphX parity pinned by GraphOpsParitySpec). */
  private def g2(s: SparkSession, d: String): DataFrame =
    GraphOps.connectedComponentsDF(s, nationEdges(s, d))

  /** g3 — static PageRank, 3 iterations, on the part hierarchy
    * (child→parent edges; mirrors GraphX's exact update
    * rank' = 0.15 + 0.85·Σ rank·(1/outdeg), init 1.0, followed by
    * GraphX's sink correction: final ranks normalized to sum to the
    * vertex count). */
  private def g3(s: SparkSession, d: String): DataFrame =
    // rank rounded on BOTH sides: GraphX's and the oracle's sum orders
    // differ in the last ulps (~1e-13), one drift away from a hash flake
    GraphOps.staticPageRank(s, partEdges(s, d)
      .select(col("child").as("src"), col("parent").as("dst")), iters = 3)
      .withColumn("rank", round(col("rank"), 6))

  /** g4 — multi-hop traversal via two aggregateMessages passes
    * (`person.Children(_)` hops, `Kernel/Drafts/draft:138-142`):
    * children + grandchildren counts per part node. */
  private def g4(s: SparkSession, d: String): DataFrame =
    GraphOps.childAndGrandchildCounts(s, partEdges(s, d)
      .select(col("child").as("src"), col("parent").as("dst")))

  /** g5 — relationship-cardinality / unique-index constraint checks
    * (`data index ... n..1` `Kernel/Drafts/draft_students:23-24`,
    * `Unique` `Kernel/README.md:64-74`): enforced as validation queries
    * (SURVEY §7 — post-write validation, documented divergence). */
  private def g5(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders"); val c = t(s, d, "customer"); val l = t(s, d, "lineitem")
    def row(name: String, df: DataFrame) =
      df.agg(count(lit(1)).cast("long").as("n_violations"))
        .withColumn("constraint_name", lit(name))
        .select("constraint_name", "n_violations")
    row("fk_orders_customer",
      o.join(c, o("o_custkey") === c("c_custkey"), "left_anti"))
      .union(row("fk_lineitem_orders",
        l.join(o, l("l_orderkey") === o("o_orderkey"), "left_anti")))
      .union(row("unique_customer_key",
        c.groupBy("c_custkey").count().filter(col("count") > 1)))
  }

  /** g6 — single-source shortest hop-distances over a multi-path DAG:
    * the part hierarchy's tree edges (k → k div 2) PLUS skip edges
    * (k → k div 4), so most nodes have a strictly shorter path than
    * their tree depth and the min-aggregate semantics are non-vacuous.
    * The recursive-aggregate rule (stratified Datalog `min`,
    * `Kernel/README.md:107-121` rules + aggregate partitioning) that
    * plain transitive closure can't express — evaluated by BFS layering
    * (`Fixpoint.bfsDistances`), oracled by a recursive CTE + MIN. */
  private def g6(s: SparkSession, d: String): DataFrame = {
    val p = t(s, d, "part")
    val tree = p.select(col("p_partkey").as("child"), expr("p_partkey div 2").as("parent"))
      .filter(col("parent") >= 1)
    val skip = p.select(col("p_partkey").as("child"), expr("p_partkey div 4").as("parent"))
      .filter(col("p_partkey") >= 4 && col("parent") >= 1)
    Fixpoint.bfsDistances(tree.union(skip), source = 1L)
      .select(col("node"), col("dist").cast("long").as("dist"))
  }

  /** g7 — per-vertex triangle counts on the nation co-region graph (5
    * region cliques → C(4,2)=6 triangles per vertex of a 5-clique). The
    * canonical distributed enumeration: edges kept in one orientation
    * (src < dst — in general, degree order), triangles found by two
    * equi-joins, so work is Σ deg(u)·deg(v) over edges, never an
    * all-pairs product; each triangle counted exactly once then
    * exploded to its three corners for the per-vertex tally. */
  private def g7(s: SparkSession, d: String): DataFrame = {
    val e = nationEdges(s, d)
    val ab = e.select(col("src").as("a"), col("dst").as("b"))
    val bc = e.select(col("src").as("b"), col("dst").as("c"))
    val ac = e.select(col("src").as("a"), col("dst").as("c"))
    ab.join(bc, "b").join(ac, Seq("a", "c"))
      .select(explode(array(col("a"), col("b"), col("c"))).as("n_nationkey"))
      .groupBy("n_nationkey")
      .agg(count(lit(1)).cast("long").as("n_triangles"))
  }

  /** rel1 — bidirectional relationship field with n..1 cardinality
    * (`Kernel/Drafts/draft:36-38`, `draft_students:23-24`): link the
    * part hierarchy through the enforcing store, emit the BACKWARD
    * direction — the same committed rows projected parent→child, so the
    * oracle checking it also checks two-direction consistency. */
  private def rel1(s: SparkSession, d: String): DataFrame = {
    val rs = new graft.store.RelationshipStore(new graft.store.TableStore(s,
      java.nio.file.Files.createTempDirectory("graft-rel-").toString))
    rs.declare(graft.store.RelDecl("parent_of", "child", "parent", "n..1"))
    rs.link("parent_of", partEdges(s, d)
      .select(col("child").as("src"), col("parent").as("dst")))
    rs.backward("parent_of")
  }

  /** g8 — community detection by SYNCHRONOUS label propagation
    * (Raghavan et al. 2007) over the symmetrized part hierarchy, made
    * fully deterministic so it can carry an exact oracle: every vertex
    * starts labeled with its own id; each round every vertex adopts the
    * most frequent label among its neighbors, ties broken to the
    * SMALLEST label (the async/random tie-breaks of textbook LPA and
    * GraphX's implementation are what make them unreproducible — the
    * sync+min rule is the same fixed point family without the dice).
    * Three rounds, unrolled identically in the DuckDB oracle.
    *
    * Scale shape: per round ONE edge⋈labels equi-join (shuffle keyed on
    * the 8-byte vertex id) + a (vertex, label) count + a max-struct
    * argmax — linear in |E| per round, the textbook distributed-LPA
    * cost; labels are checkpointed per round so the plan never deepens
    * with round count (the Fixpoint convention). */
  private def g8(s: SparkSession, d: String): DataFrame = {
    val e = partEdges(s, d)
    val sym = e.select(col("child").as("u"), col("parent").as("nbr"))
      .unionByName(e.select(col("parent").as("u"), col("child").as("nbr")))
      .localCheckpoint() // probed every round; never recompute the scan
    var labels = t(s, d, "part")
      .select(col("p_partkey").as("v"), col("p_partkey").as("lbl"))
    (1 to 3).foreach { _ =>
      labels = sym.join(labels, sym("nbr") === labels("v"))
        .groupBy(col("u"), col("lbl")).agg(count(lit(1)).as("c"))
        // argmax by count, tie to the smallest label: max over
        // (count, -label) structs compares lexicographically
        .groupBy(col("u"))
        .agg(max(struct(col("c"), (-col("lbl")).as("nl"))).as("m"))
        .select(col("u").as("v"), (-col("m.nl")).as("lbl"))
        .localCheckpoint()
    }
    labels.select(col("v").as("part_id"), col("lbl").as("community"))
  }

  /** g9 — k-core decomposition (k=2) by iterative peeling (Matula &
    * Beck 1983; the standard graph-mining primitive next to CC/PR/LPA):
    * repeatedly strip vertices of degree < k until a fixpoint; emit
    * every vertex with the ROUND it was peeled in (0 = survives in the
    * core), so the oracle pins the exact peel dynamics, not just core
    * membership. Fixture: the part hierarchy (a tree — dissolves
    * bottom-up, one leaf layer per round) unioned with the
    * nation-region cliques on an offset id space (min degree 4 —
    * the surviving 2-core).
    *
    * Scale shape: each round is one degree aggregation over the
    * remaining edges (partial-agg exchange keyed by vertex) + an
    * anti-join strike-out, under [[Fixpoint.withIterativeConf]] with
    * localCheckpoint lineage truncation; rounds = peel depth (tree
    * height here, small for real social/web graphs once k > 2). The
    * peeled set per round is tiny relative to the corpus — AQE-free
    * static plans keep the per-round driver cost flat. */
  private def g9(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Fixpoint
    val nat = t(s, d, "nation")
      .select(col("n_nationkey").as("nk"), col("n_regionkey").as("rk"))
    val cliq = nat.as("a").join(nat.as("b"),
        col("a.rk") === col("b.rk") && col("a.nk") < col("b.nk"))
      .select((col("a.nk") + 1000000L).as("u"), (col("b.nk") + 1000000L).as("v"))
    val tree = partEdges(s, d)
      .select(col("child").cast("long").as("u"), col("parent").cast("long").as("v"))
    Fixpoint.withIterativeConf(s) {
      // the LOOP materializes only what the next round needs — the
      // struck-vertex set (control flow) and the surviving edges (the
      // next round's base): 2 driver round-trips per round. Peel-round
      // labels are assembled AFTER convergence in ONE job from the
      // retained (already-cached) edge snapshots — the previous
      // shape's per-round verts + peeled checkpoints were 2 more
      // round-trips per round paying for information the end of the
      // loop can derive (measured: the per-round driver constant, not
      // the data, dominates this loop at sf0.1).
      var edges = tree.unionByName(cliq).localCheckpoint()
      var edgeCount = edges.count()
      val snapshots = scala.collection.mutable.ArrayBuffer(edges)
      var done = false
      while (!done) {
        // the struck set is NOT materialized on its own: it appears
        // twice in the strike plan (u-side and v-side anti-join), but
        // both sides share one canonical degree-aggregate subtree, so
        // ReuseExchange computes the shuffle ONCE inside the single
        // per-round job — same data work as a separate checkpoint,
        // one driver round-trip instead of two
        val deg = edges.select(col("u").as("x"))
          .unionByName(edges.select(col("v").as("x")))
          .groupBy("x").agg(count(lit(1)).as("dg"))
        val gone = deg.filter(col("dg") < 2).select("x")
        val next = edges
          .join(gone.withColumnRenamed("x", "u"), Seq("u"), "left_anti")
          .join(gone.withColumnRenamed("x", "v"), Seq("v"), "left_anti")
          .localCheckpoint()
        // convergence probe on the CACHED count: a struck vertex has
        // exactly one remaining edge (degree ∈ {1} — degree-0 vertices
        // never appear in a frame built from edges), so "nothing
        // struck" ⟺ the edge count did not move
        val nextCount = next.count()
        if (nextCount == edgeCount) done = true
        else {
          edges = next
          edgeCount = nextCount
          snapshots += edges
        }
      }
      // a vertex is peeled the round its LAST edge leaves the set —
      // whether it was below-degree itself or its neighbors were
      // (collateral orphans peel in the same round, as in the snapshot
      // semantics the oracle's recursion expresses). One aggregation
      // derives every label: tag each snapshot's endpoints with its
      // round index; a vertex last seen in E_r was peeled in round r+1,
      // and one seen in the final snapshot is core (0) — a single
      // shuffle instead of a per-round anti-join chain (the chain was
      // ~3 stages × rounds of pure scheduling in the assembly job)
      val lastRound = (snapshots.size - 1).toLong
      val tagged = snapshots.toSeq.zipWithIndex.map { case (e, r) =>
        e.select(col("u").as("x"), lit(r.toLong).as("r"))
          .unionByName(e.select(col("v").as("x"), lit(r.toLong).as("r")))
      }.reduce(_ unionByName _)
      tagged.groupBy("x").agg(max(col("r")).as("lr"))
        .select(col("x").as("v"),
          when(col("lr") === lastRound, 0L)
            .otherwise(col("lr") + 1L).as("peel_round"))
    }
  }

  /** g10 — WEIGHTED single-source shortest paths (distributed
    * Bellman-Ford; g6's BFS treats every hop as 1 — here a direct
    * skip-link (cost 5) competes with two tree hops (cost 6), so the
    * optimum genuinely differs from hop count and min-cost relaxation
    * is exercised, not just reachability). Each round relaxes every
    * edge against the current distance frame: one keyed join + one
    * min-aggregate exchange over INTEGER costs (exact, order-free),
    * localCheckpoint per round, terminating when no distance improves
    * — rounds = longest optimal path, never |V|. The oracle
    * enumerates all root-to-node walks with a recursive CTE (the
    * graph is a DAG away from the root, so the walk terminates) and
    * takes the min — path-algebra ground truth vs the relaxation. */
  private def g10(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Fixpoint
    val p = t(s, d, "part")
    val tree = p.select(col("p_partkey").as("child"),
        expr("p_partkey div 2").as("parent"), lit(3L).as("w"))
      .filter(col("parent") >= 1)
    val skip = p.select(col("p_partkey").as("child"),
        expr("p_partkey div 4").as("parent"), lit(5L).as("w"))
      .filter(col("p_partkey") >= 4 && col("parent") >= 1)
    Fixpoint.withIterativeConf(s) {
      val e = tree.unionByName(skip).localCheckpoint()
      var dist = s.range(1, 2)
        .select(col("id").as("node"), lit(0L).as("cost")).localCheckpoint()
      var changed = true
      while (changed) {
        val cand = e.join(dist.withColumnRenamed("node", "parent"), "parent")
          .select(col("child").as("node"), (col("cost") + col("w")).as("cost"))
        val next = dist.unionByName(cand)
          .groupBy("node").agg(min(col("cost")).as("cost")).localCheckpoint()
        val improved = next
          .join(dist.withColumnRenamed("cost", "old"), Seq("node"), "left")
          .filter(col("old").isNull || col("cost") < col("old")).count()
        changed = improved > 0
        dist = next
      }
      dist
    }
  }

  /** g11 — co-occurrence graph (co-purchase edges): parts appearing in
    * the same order, edge weight = number of co-occurring orders, top
    * 100 pairs under the full `(n_orders DESC, p1, p2)` total order.
    * The scale properties are the ones that matter on a real basket
    * corpus: the pair generation is an ORDER-KEYED equi-self-join over
    * `distinct(orderkey, partkey)` — cost Σ|order|², bounded because a
    * TPC-H-ish order holds ≤7 parts (a viral container key would get
    * the j11 salting treatment); raw pairs partial-aggregate map-side
    * before the one pair-keyed exchange; and the top-k is TakeOrdered
    * (per-partition heaps), never a global sort. */
  private def g11(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    li.as("a")
      .join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("p1"), col("b.l_partkey").as("p2"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("p1"), col("p2"))
      .limit(100)
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g1_transitive_closure" -> (g1 _),
    "g11_copurchase" -> (g11 _),
    "rel1_bidirectional" -> (rel1 _),
    "g2_connected_components" -> (g2 _),
    "g3_pagerank" -> (g3 _),
    "g4_multihop_counts" -> (g4 _),
    "g5_cardinality_checks" -> (g5 _),
    "g6_shortest_paths" -> (g6 _),
    "g7_triangle_count" -> (g7 _),
    "g8_label_propagation" -> (g8 _),
    "g9_kcore_peeling" -> (g9 _),
    "g10_weighted_paths" -> (g10 _),
  )

  private val edgesSql =
    "SELECT p_partkey AS child, p_partkey // 2 AS parent FROM part WHERE p_partkey // 2 >= 1"

  override val oracles: Map[String, String] = Map(
    "g11_copurchase" ->
      """WITH li AS (
           SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
         SELECT a.l_partkey AS p1, b.l_partkey AS p2,
                count(*) AS n_orders
         FROM li a JOIN li b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         GROUP BY 1, 2
         ORDER BY n_orders DESC, p1, p2 LIMIT 100""",
    // all root-to-node walks (DAG away from the root => terminates),
    // then min — path-algebra ground truth for the relaxation
    "g10_weighted_paths" ->
      """WITH RECURSIVE
         e AS (
           SELECT CAST(p_partkey AS BIGINT) AS child,
                  CAST(p_partkey // 2 AS BIGINT) AS parent,
                  CAST(3 AS BIGINT) AS w
           FROM part WHERE p_partkey // 2 >= 1
           UNION ALL
           SELECT CAST(p_partkey AS BIGINT),
                  CAST(p_partkey // 4 AS BIGINT), CAST(5 AS BIGINT)
           FROM part WHERE p_partkey >= 4 AND p_partkey // 4 >= 1),
         walk(node, cost) AS (
           SELECT CAST(1 AS BIGINT), CAST(0 AS BIGINT)
           UNION ALL
           SELECT e.child, w.cost + e.w
           FROM walk w JOIN e ON e.parent = w.node)
         SELECT node, min(cost) AS cost FROM walk GROUP BY node""",
    // snapshot-round recursion: working table = last round's surviving
    // edges; a round emits survivors only if something was peeled, so
    // the recursion terminates at the 2-core; a vertex's peel round is
    // one past the last snapshot it appears in (0 = in the core)
    "g9_kcore_peeling" ->
      s"""WITH RECURSIVE
         e0 AS (
           SELECT CAST(p_partkey AS BIGINT) AS u,
                  CAST(p_partkey // 2 AS BIGINT) AS v
           FROM part WHERE p_partkey // 2 >= 1
           UNION ALL
           SELECT CAST(a.n_nationkey + 1000000 AS BIGINT),
                  CAST(b.n_nationkey + 1000000 AS BIGINT)
           FROM nation a JOIN nation b
             ON a.n_regionkey = b.n_regionkey
            AND a.n_nationkey < b.n_nationkey),
         peel(round, u, v) AS (
           SELECT 0, u, v FROM e0
           UNION ALL
           SELECT round + 1, u, v FROM (
             WITH w AS (SELECT * FROM peel),
              sym AS (SELECT round, u AS x, v AS y FROM w
                      UNION ALL SELECT round, v, u FROM w),
              deg AS (SELECT round, x, count(*) AS d FROM sym GROUP BY 1, 2),
              gone AS (SELECT round, x FROM deg WHERE d < 2)
             SELECT w.round, w.u, w.v FROM w
             WHERE NOT EXISTS (SELECT 1 FROM gone g
                               WHERE g.round = w.round AND g.x IN (w.u, w.v))
               AND EXISTS (SELECT 1 FROM gone g WHERE g.round = w.round))),
         verts AS (SELECT u AS x, round FROM peel
                   UNION ALL SELECT v, round FROM peel),
         last AS (SELECT x, max(round) AS mr FROM verts GROUP BY 1),
         mx AS (SELECT max(round) AS fin FROM peel)
         SELECT CAST(x AS BIGINT) AS v,
           CAST(CASE WHEN mr = fin THEN 0 ELSE mr + 1 END AS BIGINT)
             AS peel_round
         FROM last, mx""",
    "g1_transitive_closure" ->
      s"""WITH RECURSIVE edges AS ($edgesSql),
         anc AS (
           SELECT child, parent AS anc FROM edges
           UNION
           SELECT e.child, a.anc FROM edges e JOIN anc a ON e.parent = a.child)
         SELECT child, anc FROM anc""",
    "rel1_bidirectional" ->
      s"""SELECT p_partkey // 2 AS src, p_partkey AS dst FROM part
          WHERE p_partkey // 2 >= 1""",
    "g2_connected_components" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS node,
                CAST(min(n_nationkey) OVER (PARTITION BY n_regionkey) AS BIGINT) AS component
         FROM nation""",
    "g3_pagerank" ->
      s"""WITH e AS ($edgesSql),
         ed AS (SELECT child AS src, parent AS dst FROM e),
         v AS (SELECT DISTINCT node FROM
                 (SELECT src AS node FROM ed UNION ALL SELECT dst FROM ed)),
         od AS (SELECT src, count(*) AS outdeg FROM ed GROUP BY src),
         p0 AS (SELECT node, 1.0 AS pr FROM v),
         p1 AS (SELECT v.node, 0.15 + 0.85 * coalesce(s.m, 0.0) AS pr
                FROM v LEFT JOIN (
                  SELECT ed.dst AS node, sum(p0.pr * (1.0 / od.outdeg)) AS m
                  FROM ed JOIN p0 ON ed.src = p0.node JOIN od ON ed.src = od.src
                  GROUP BY ed.dst) s ON v.node = s.node),
         p2 AS (SELECT v.node, 0.15 + 0.85 * coalesce(s.m, 0.0) AS pr
                FROM v LEFT JOIN (
                  SELECT ed.dst AS node, sum(p1.pr * (1.0 / od.outdeg)) AS m
                  FROM ed JOIN p1 ON ed.src = p1.node JOIN od ON ed.src = od.src
                  GROUP BY ed.dst) s ON v.node = s.node),
         p3 AS (SELECT v.node, 0.15 + 0.85 * coalesce(s.m, 0.0) AS pr
                FROM v LEFT JOIN (
                  SELECT ed.dst AS node, sum(p2.pr * (1.0 / od.outdeg)) AS m
                  FROM ed JOIN p2 ON ed.src = p2.node JOIN od ON ed.src = od.src
                  GROUP BY ed.dst) s ON v.node = s.node)
         SELECT CAST(node AS BIGINT) AS node,
                round(pr * ((SELECT count(*) FROM v) / (SELECT sum(pr) FROM p3)), 6) AS rank
         FROM p3""",
    "g4_multihop_counts" ->
      s"""WITH e AS ($edgesSql),
         ed AS (SELECT child AS src, parent AS dst FROM e),
         c AS (SELECT dst AS node, count(*) AS n_children FROM ed GROUP BY dst)
         SELECT c.node, c.n_children,
           CAST(coalesce(g.n, 0) AS BIGINT) AS n_grandchildren
         FROM c LEFT JOIN (
           SELECT ed.dst AS node, CAST(sum(coalesce(c2.n_children, 0)) AS BIGINT) AS n
           FROM ed LEFT JOIN c c2 ON ed.src = c2.node
           GROUP BY ed.dst) g ON c.node = g.node""",
    "g6_shortest_paths" ->
      s"""WITH RECURSIVE e AS (
           SELECT p_partkey AS child, p_partkey // 2 AS parent FROM part
           WHERE p_partkey // 2 >= 1
           UNION ALL
           SELECT p_partkey, p_partkey // 4 FROM part
           WHERE p_partkey >= 4 AND p_partkey // 4 >= 1),
         walk AS (
           SELECT CAST(1 AS BIGINT) AS node, 0 AS dist
           UNION
           SELECT e.child, w.dist + 1 FROM e JOIN walk w ON e.parent = w.node)
         SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM walk GROUP BY node""",
    "g7_triangle_count" ->
      """WITH e AS (
           SELECT n1.n_nationkey AS src, n2.n_nationkey AS dst
           FROM nation n1 JOIN nation n2
             ON n1.n_regionkey = n2.n_regionkey
            AND n1.n_nationkey < n2.n_nationkey),
         tri AS (
           SELECT ab.src AS a, ab.dst AS b, bc.dst AS c
           FROM e ab JOIN e bc ON ab.dst = bc.src
                     JOIN e ac ON ac.src = ab.src AND ac.dst = bc.dst)
         SELECT n_nationkey, count(*) AS n_triangles
         FROM (SELECT a AS n_nationkey FROM tri
               UNION ALL SELECT b FROM tri
               UNION ALL SELECT c FROM tri)
         GROUP BY n_nationkey""",
    "g8_label_propagation" ->
      """WITH e0 AS (SELECT p_partkey AS child, p_partkey // 2 AS parent
                     FROM part WHERE p_partkey // 2 >= 1),
         edges AS (SELECT child AS u, parent AS nbr FROM e0
                   UNION ALL SELECT parent, child FROM e0),
         l0 AS (SELECT p_partkey AS v, p_partkey AS lbl FROM part),
         c1 AS (SELECT e.u, l.lbl, count(*) AS c FROM edges e
                JOIN l0 l ON l.v = e.nbr GROUP BY 1, 2),
         l1 AS (SELECT u AS v, lbl FROM (
                  SELECT u, lbl, row_number() OVER (
                    PARTITION BY u ORDER BY c DESC, lbl ASC) AS rn FROM c1)
                WHERE rn = 1),
         c2 AS (SELECT e.u, l.lbl, count(*) AS c FROM edges e
                JOIN l1 l ON l.v = e.nbr GROUP BY 1, 2),
         l2 AS (SELECT u AS v, lbl FROM (
                  SELECT u, lbl, row_number() OVER (
                    PARTITION BY u ORDER BY c DESC, lbl ASC) AS rn FROM c2)
                WHERE rn = 1),
         c3 AS (SELECT e.u, l.lbl, count(*) AS c FROM edges e
                JOIN l2 l ON l.v = e.nbr GROUP BY 1, 2),
         l3 AS (SELECT u AS v, lbl FROM (
                  SELECT u, lbl, row_number() OVER (
                    PARTITION BY u ORDER BY c DESC, lbl ASC) AS rn FROM c3)
                WHERE rn = 1)
         SELECT v AS part_id, lbl AS community FROM l3""",
    "g5_cardinality_checks" ->
      """SELECT 'fk_orders_customer' AS constraint_name,
                count(*) AS n_violations
         FROM orders WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
         UNION ALL
         SELECT 'fk_lineitem_orders', count(*)
         FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
         UNION ALL
         SELECT 'unique_customer_key', count(*)
         FROM (SELECT c_custkey FROM customer GROUP BY c_custkey HAVING count(*) > 1)""",
  )
}
