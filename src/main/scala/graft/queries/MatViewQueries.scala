package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.store.{MaterializedView, TableStore}
import graft.store.MaterializedView.MvSpec

/** Incremental materialized-view gates ([[graft.store.MaterializedView]]
  * — the reference's cached-query design, `Kernel/README.md:142-161`,
  * maintained under mutation instead of invalidated by it).
  *
  * Both gates drive the MV through a real batch schedule — build from a
  * base slice, then several insert/delete refreshes — and publish the
  * final MV; the DuckDB oracle states the view's DEFINITION over the
  * final base content in one aggregate. Equality therefore proves the
  * maintenance converged on exactly what a full recompute would say,
  * while the Spark side never re-touched the base after the build (the
  * refresh API takes only the delta — MatViewSpec deletes the base
  * files between build and refresh to prove there is no hidden rescan).
  */
object MatViewQueries extends QueryPack {

  private def scratch(s: SparkSession): TableStore =
    new TableStore(s, Files.createTempDirectory("graft-store-").toString)

  /** Exact per-row partials (the repo's accumulation-order-free
    * convention): quantities are integral doubles → BIGINT; money →
    * half-up cents. One lossy division at publish. */
  private val spec = MvSpec(
    keys = Seq("l_returnflag", "l_linestatus"),
    sums = Seq(
      "__qty" -> expr("CAST(l_quantity AS BIGINT)"),
      "__cents" -> expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")))

  private def publish(mv: DataFrame): DataFrame =
    mv.select(col("l_returnflag"), col("l_linestatus"), col("n_rows"),
      expr("CAST(__qty AS DOUBLE)").as("sum_qty"),
      expr("CAST(__cents AS DOUBLE) / 100.0").as("sum_price"))

  /** mv1 — insert maintenance: build over 3/4 of lineitem, then apply
    * the remaining quarter as three insert batches (split by
    * l_linenumber residue); each refresh aggregates only its batch and
    * merges with the #groups-sized MV. Final MV ≡ the view over ALL of
    * lineitem. */
  private def mv1(s: SparkSession, d: String): DataFrame = {
    val st = scratch(s)
    val li = t(s, d, "lineitem")
    MaterializedView.build(st, "mv", li.filter(col("l_orderkey") % 4 =!= 3), spec)
    (0 until 3).foreach { r =>
      val batch = li.filter(col("l_orderkey") % 4 === 3 &&
        col("l_linenumber") % 3 === r)
      MaterializedView.refreshInsert(st, "mv", batch, spec)
    }
    publish(st.read("mv"))
  }

  /** mv2 — delete maintenance (the counting algorithm's hard half):
    * per-ORDER view over full lineitem, then every row of orders with
    * `o_orderkey % 7 = 0` is deleted in two batches — those ORDER
    * groups reach n_rows = 0 and leave the view entirely, which only
    * exact counts can decide. Final MV ≡ the view over the surviving
    * rows. */
  private def mv2(s: SparkSession, d: String): DataFrame = {
    val st = scratch(s)
    val li = t(s, d, "lineitem")
    val spec2 = MvSpec(Seq("l_orderkey"),
      Seq("__qty" -> expr("CAST(l_quantity AS BIGINT)")))
    MaterializedView.build(st, "mv", li, spec2)
    (0 until 2).foreach { r =>
      val gone = li.filter(col("l_orderkey") % 7 === 0 &&
        col("l_linenumber") % 2 === r)
      MaterializedView.refreshDelete(st, "mv", gone, spec2)
    }
    st.read("mv").select(col("l_orderkey"), col("n_rows"),
      expr("CAST(__qty AS DOUBLE)").as("sum_qty"))
  }

  /** mv3 — TRANSACTIONAL write-through maintenance: the view is
    * REGISTERED against its base in the store's view registry, and
    * every [[MaterializedView.insertInto]] commits base append + view
    * refresh atomically — no reader can observe the two out of sync,
    * and base version k time-travels alongside view version k
    * (MatViewSpec pins both). Same final truth as mv1, reached through
    * the registry path instead of explicit refresh calls. */
  private def mv3(s: SparkSession, d: String): DataFrame = {
    val st = scratch(s)
    val li = t(s, d, "lineitem").select("l_orderkey", "l_linenumber",
      "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
    st.create("li_base", li.filter(col("l_orderkey") % 4 =!= 3))
    MaterializedView.register(st, "mv", "li_base",
      MaterializedView.MvDef(
        Seq("l_returnflag", "l_linestatus"),
        Seq("__qty" -> "CAST(l_quantity AS BIGINT)",
          "__cents" -> "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")))
    (0 until 3).foreach { r =>
      MaterializedView.insertInto(st, "li_base",
        li.filter(col("l_orderkey") % 4 === 3 && col("l_linenumber") % 3 === r))
    }
    publish(st.read("mv"))
  }

  /** mv4 — MIN/MAX maintenance under an insert-only schedule: extrema
    * fold exactly through batch merges (`min(a ∪ b) = min(min a,
    * min b)` — a pick, not an accumulation, so no float-order hazard),
    * which is precisely as far as min/max self-maintainability goes:
    * under deletes they would need a group rescan, and
    * [[MaterializedView.refreshDelete]] rejects such a spec loudly
    * (spec-pinned) instead of corrupting the view. */
  private def mv4(s: SparkSession, d: String): DataFrame = {
    val st = scratch(s)
    val li = t(s, d, "lineitem")
    val spec4 = MvSpec(Seq("l_returnflag", "l_linestatus"),
      sums = Seq("__qty" -> expr("CAST(l_quantity AS BIGINT)")),
      mins = Seq("min_price" -> col("l_extendedprice")),
      maxs = Seq("max_price" -> col("l_extendedprice")))
    MaterializedView.build(st, "mv", li.filter(col("l_orderkey") % 4 =!= 3), spec4)
    (0 until 3).foreach { r =>
      MaterializedView.refreshInsert(st, "mv",
        li.filter(col("l_orderkey") % 4 === 3 && col("l_linenumber") % 3 === r),
        spec4)
    }
    st.read("mv").select(col("l_returnflag"), col("l_linestatus"),
      col("n_rows"), expr("CAST(__qty AS DOUBLE)").as("sum_qty"),
      col("min_price"), col("max_price"))
  }

  /** mv12 — SKETCH-BACKED incremental MV: the view carries a KMV
    * distinct-partkey sketch column (the ascending ≤ 256-long array of
    * minimum md5-60bit hashes) maintained under insert refreshes by
    * PURE ARRAY ALGEBRA — merged = k smallest of the union (KMV
    * mergeability, Beyer et al. 2007) — so the view serves approximate
    * DISTINCT counts per group incrementally, without the base rescan
    * every exact distinct-count refresh needs (distinct is famously
    * NOT self-maintainable; the sketch is, under inserts). Build over
    * 3/4 of lineitem + three insert batches; because the sketch of a
    * union is batch-path-independent, the final column equals the
    * sketch over ALL of lineitem, which is exactly what the DuckDB
    * oracle computes (a18's algebra) — full hash-strict oracle, exact
    * below k. At 100 TB this is how a dashboard's distinct-counts MV
    * stays fresh: each refresh touches the delta plus #groups ≤ k-long
    * arrays. */
  private def mv12(s: SparkSession, d: String): DataFrame = {
    val st = scratch(s)
    val li = t(s, d, "lineitem")
    val k = 256
    val spec12 = MvSpec(Seq("l_returnflag"),
      sums = Seq("__qty" -> expr("CAST(floor(l_quantity) AS BIGINT)")),
      kmvs = Seq("__pk_sk" -> expr(
        "CAST(conv(substring(md5(CAST(l_partkey AS STRING)), 1, 15), 16, 10) AS BIGINT)")),
      kmvK = k)
    MaterializedView.build(st, "mv", li.filter(col("l_orderkey") % 4 =!= 3), spec12)
    (0 until 3).foreach { r =>
      MaterializedView.refreshInsert(st, "mv",
        li.filter(col("l_orderkey") % 4 === 3 && col("l_linenumber") % 3 === r),
        spec12)
    }
    st.read("mv").select(col("l_returnflag"), col("n_rows"),
      expr("CAST(__qty AS BIGINT)").as("sum_qty"),
      expr("CAST(size(__pk_sk) AS BIGINT)").as("n_k"),
      when(expr(s"size(__pk_sk) < $k"),
          expr("CAST(size(__pk_sk) AS BIGINT)") * lit(1000000L))
        .otherwise(expr(
          s"""CAST(floor((${k - 1}.0 * 1152921504606846976.0 /
             CAST(element_at(__pk_sk, $k) AS DOUBLE)) * 1000000.0) AS BIGINT)"""))
        .as("est_distinct_micro"))
  }

  /** mv5 — the language's `@insert` composes with the view registry:
    * a view registered over `Exams` stays consistent when rows arrive
    * through PARSED HeroQL (`query AddExam :- @insert Exams(...)`),
    * refreshed in the same atomic mutation commit. Oracle: the view
    * definition over seed + inserted batch — a language path that
    * bypassed the registry would leave the view at seed-only totals
    * and hash-mismatch. */
  private def mv5(s: SparkSession, d: String): DataFrame = {
    val st = scratch(s)
    val seed = t(s, d, "orders").filter(col("o_orderkey") % 10 === 0)
      .select(col("o_custkey").cast("string").as("student"),
        expr("CAST(floor(o_totalprice) AS INT)").as("score"))
    st.create("Exams", seed)
    MaterializedView.register(st, "mv", "Exams",
      MaterializedView.MvDef(Seq("student"),
        Seq("__score" -> "CAST(score AS BIGINT)")))
    val program = """
data Exams(student: string, score: int).
query AddExam(student: string, score: int)
:-  @insert Exams(student, score)
.
"""
    val batch = t(s, d, "orders").filter(col("o_orderkey") % 10 === 1)
      .select(col("o_custkey").cast("string").as("student"),
        expr("CAST(floor(o_totalprice) AS INT) + 7").as("score"))
    graft.heroql.HeroQL.executeMutation(program, "AddExam", batch, st)
    st.read("mv").select(col("student"), col("n_rows"),
      col("__score").as("sum_score"))
  }

  /** mv6 — TRANSPARENT rewrite ([[graft.plans.MvRewrite]]): the gate
    * queries the BASE table with a plain groupBy (a key SUBSET — the
    * rollup case), and the installed optimizer rule redirects the
    * whole aggregate to the registered, write-maintained view. The
    * gate REFUSES to answer from the base: it asserts the optimized
    * plan reads only the view's files before materializing, so a
    * silently-disengaged rule fails loudly instead of passing on the
    * base scan. Inserts after registration arrive through the
    * maintained write path, so the rewritten answer must equal the
    * oracle's full-base aggregate. */
  private def mv6(s: SparkSession, d: String): DataFrame = {
    val st = scratch(s)
    val li = t(s, d, "lineitem").select(
      col("l_returnflag"), col("l_linestatus"),
      expr("CAST(l_quantity AS BIGINT)").as("qty"),
      expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("cents"))
    st.create("facts", li.filter(col("qty") % 4 =!= 3))
    MaterializedView.register(st, "facts_view", "facts",
      MaterializedView.MvDef(Seq("l_returnflag", "l_linestatus"),
        Seq("sum_qty" -> "qty", "sum_cents" -> "cents")))
    MaterializedView.insertInto(st, "facts", li.filter(col("qty") % 4 === 3))
    val rule = graft.plans.MvRewrite.install(s, st)
    try {
      val agg = st.read("facts").groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          expr("sum(qty)").as("__q"), expr("sum(cents)").as("__c"))
      val scans = agg.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation.asInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.rootPaths.map(_.toUri.getPath)
      }.flatten
      require(scans.nonEmpty && scans.forall(_.contains("/facts_view/")),
        s"mv6: rewrite did not engage — plan reads ${scans.mkString(", ")}")
      // materialize WHILE the rule is installed; the returned frame is
      // the already-rewritten result, not a plan to re-optimize later
      agg.select(col("l_returnflag"), col("n_rows"),
        expr("CAST(__q AS DOUBLE)").as("sum_qty"),
        expr("CAST(__c AS DOUBLE) / 100.0").as("sum_price"))
        .localCheckpoint()
    } finally graft.plans.MvRewrite.uninstall(s, rule)
  }

  /** mv7 — incrementally-maintained JOIN view ([[graft.store.JoinViews]],
    * the delta-rule IVM Δ(A⋈B) = ΔA⋈B ∪ A'⋈ΔB): register orders ⋈
    * customer-dim on custkey, then grow BOTH sides — a fact batch, a
    * dim batch, and a both-sides-in-one-transaction batch (the
    * read-your-writes composition that makes the algebra exact). The
    * view must equal the plain join of the FINAL relations; the Spark
    * side only ever joined each batch against the other side's current
    * content and appended (JoinViewsSpec pins the append-only dir
    * growth and the one-txn schedule). */
  private def mv7(s: SparkSession, d: String): DataFrame = {
    val st = scratch(s)
    val cust = t(s, d, "customer").select(
      col("c_custkey").as("o_custkey"), col("c_mktsegment"),
      col("c_nationkey"))
    val ord = t(s, d, "orders").select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("price_cents"))
    st.create("dim_cust", cust.filter(col("o_custkey") % 3 === 0))
    st.create("fact_ord", ord.filter(col("o_orderkey") % 4 === 0))
    graft.store.JoinViews.register(st, "ord_cust", "fact_ord", "dim_cust",
      Seq("o_custkey"))
    // fact-side batch, then dim-side batch, each via the maintained door
    st.insert("fact_ord", ord.filter(col("o_orderkey") % 4 === 1))
    st.insert("dim_cust", cust.filter(col("o_custkey") % 3 === 1))
    // both sides in ONE transaction through the txn-level front door
    st.transaction { tx =>
      graft.store.WritePath.insert(tx, "fact_ord",
        ord.filter(col("o_orderkey") % 4 === 2))
      graft.store.WritePath.insert(tx, "dim_cust",
        cust.filter(col("o_custkey") % 3 === 2))
    }
    require(graft.store.JoinViews.isFresh(st, "ord_cust"),
      "mv7: maintained view must report fresh")
    st.read("ord_cust")
  }

  /** mv8 — CHAINED IVM: an aggregate view registered ON a join view
    * ([[graft.store.JoinViews]] → [[graft.store.MaterializedView]]).
    * One base insert flows base → join delta → aggregate fold inside a
    * single atomic commit, each layer incremental (the agg layer folds
    * the probe-sized join delta, never rescanning the view). Batches
    * grow both sides; the final AGG VIEW must equal the SQL aggregate
    * over the join of the final relations. JoinViewsSpec proves the
    * fold is genuinely incremental (a poisoned agg row survives
    * maintenance — a rebuild would heal it). */
  private def mv8(s: SparkSession, d: String): DataFrame = {
    val st = scratch(s)
    val cust = t(s, d, "customer").select(
      col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val ord = t(s, d, "orders").select(
      col("o_orderkey"), col("o_custkey"),
      expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("price_cents"))
    st.create("dim_c", cust.filter(col("o_custkey") % 3 === 0))
    st.create("fact_o", ord.filter(col("o_orderkey") % 4 === 0))
    graft.store.JoinViews.register(st, "oc_jv", "fact_o", "dim_c",
      Seq("o_custkey"))
    graft.store.MaterializedView.register(st, "oc_agg", "oc_jv",
      graft.store.MaterializedView.MvDef(Seq("c_mktsegment"),
        Seq("sum_cents" -> "price_cents")))
    st.insert("fact_o", ord.filter(col("o_orderkey") % 4 === 1))
    st.insert("dim_c", cust.filter(col("o_custkey") % 3 === 1))
    st.read("oc_agg")
  }

  /** mv9 — transparent JOIN rewrite ([[graft.plans.JvRewrite]], the
    * join-side complement of mv6): a registered fact ⋈ dim view grown
    * through maintained inserts, then a PLAIN `fact.join(dim, keys)`
    * written with no knowledge of the view — the optimizer redirects
    * it to the pre-joined result. The gate REFUSES to answer unless
    * the optimized plan reads ONLY view files (fresh rows included —
    * the maintained path keeps the watermark fence closed). At 100 TB
    * this replaces the query-time fact-dim shuffle join with a scan of
    * the incrementally-maintained join. */
  private def mv9(s: SparkSession, d: String): DataFrame = {
    val st = scratch(s)
    val cust = t(s, d, "customer").select(
      col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val ord = t(s, d, "orders").select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
    st.create("dim9", cust)
    st.create("fact9", ord.filter(col("o_orderkey") % 2 === 0))
    graft.store.JoinViews.register(st, "jv9", "fact9", "dim9",
      Seq("o_custkey"))
    st.insert("fact9", ord.filter(col("o_orderkey") % 2 === 1))
    val rule = graft.plans.JvRewrite.install(s, st)
    try {
      val joined = st.read("fact9").join(st.read("dim9"), Seq("o_custkey"))
      val scans = joined.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation.asInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.rootPaths.map(_.toUri.getPath)
      }.flatten
      require(scans.nonEmpty && scans.forall(_.contains("/jv9/")),
        s"mv9: join rewrite did not engage — plan reads ${scans.mkString(", ")}")
      joined.localCheckpoint()
    } finally graft.plans.JvRewrite.uninstall(s, rule)
  }

  /** mv10 — FOREIGN-KEY join elimination ([[graft.plans.FkJoinElim]]):
    * fact orders carry a declared FK to a UNIQUE-keyed customer dim;
    * a query that joins them but uses the dim ONLY for its key is the
    * identity on fact, and the rule drops the join and the dim scan
    * outright — no view needed, the CONSTRAINTS are the metadata. The
    * fixture grows fact through the checked front door so the validity
    * watermark chain reaches the current manifests; the gate REFUSES
    * to answer from a plan that still contains a Join, and the oracle
    * states the JOINED query — so elimination correctness (FK ⇒ no
    * row drops, UNIQUE ⇒ no duplication) is externally verified. */
  private def mv10(s: SparkSession, d: String): DataFrame = {
    val st = scratch(s)
    val cust = t(s, d, "customer").select("c_custkey", "c_mktsegment")
    val ord = t(s, d, "orders").select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("price_cents"))
    st.create("dim10", cust)
    st.create("fact10", ord.filter(col("o_orderkey") % 3 === 0))
    graft.store.CheckConstraints.declareUnique(st, "dim10",
      "dim10_pk", Seq("c_custkey"))
    graft.store.CheckConstraints.declareForeignKey(st, "fact10",
      "fact10_cust_fk", Seq("o_custkey"), "dim10", Seq("c_custkey"))
    // grow the fact through ADMISSION CONTROL: the watermark advances
    graft.store.CheckConstraints.insert(st, "fact10",
      ord.filter(col("o_orderkey") % 3 === 1))
    val rule = graft.plans.FkJoinElim.install(s, st)
    try {
      val q = st.read("fact10")
        .join(st.read("dim10"), col("o_custkey") === col("c_custkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("price_cents")).as("__c"))
      val joins = q.queryExecution.optimizedPlan.collect {
        case jn: org.apache.spark.sql.catalyst.plans.logical.Join => jn
      }
      require(joins.isEmpty,
        s"mv10: FK join elimination did not engage:\n${q.queryExecution.optimizedPlan}")
      q.select(col("o_orderstatus"), col("n_orders"),
        expr("CAST(__c AS DOUBLE) / 100.0").as("sum_price"))
        .localCheckpoint()
    } finally graft.plans.FkJoinElim.uninstall(s, rule)
  }

  /** mv11 — UNIQUE-proven DISTINCT elimination
    * ([[graft.plans.DistinctElim]], the fourth transparent rewrite):
    * `SELECT DISTINCT key, col…` over a table whose validated UNIQUE
    * key ⊆ the distinct columns is the identity — the rule drops the
    * aggregate AND its shuffle. The fixture grows the table through
    * admission control (watermark chain reaches the current manifest);
    * the gate REFUSES to answer from a plan still containing an
    * Aggregate or Exchange, and the oracle states the DISTINCT query —
    * so "every row already unique" is externally verified. */
  private def mv11(s: SparkSession, d: String): DataFrame = {
    val st = scratch(s)
    val ord = t(s, d, "orders").select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
    st.create("t11", ord.filter(col("o_orderkey") % 3 === 0))
    graft.store.CheckConstraints.declareUnique(st, "t11",
      "t11_pk", Seq("o_orderkey"))
    graft.store.CheckConstraints.insert(st, "t11",
      ord.filter(col("o_orderkey") % 3 =!= 0))
    val rule = graft.plans.DistinctElim.install(s, st)
    try {
      val q = st.read("t11")
        .filter(col("o_orderstatus") =!= "X")
        .select("o_orderkey", "o_custkey").distinct()
      val aggs = q.queryExecution.optimizedPlan.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }
      require(aggs.isEmpty,
        s"mv11: distinct elimination did not engage:\n${q.queryExecution.optimizedPlan}")
      require(!q.queryExecution.executedPlan.toString.contains("Exchange"),
        "mv11: the shuffle must disappear with the aggregate")
      q.localCheckpoint()
    } finally graft.plans.DistinctElim.uninstall(s, rule)
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mv9_join_rewrite" -> (mv9 _),
    "mv10_fk_join_elim" -> (mv10 _),
    "mv11_distinct_elim" -> (mv11 _),
    "mv8_chained_view" -> (mv8 _),
    "mv1_incremental_agg" -> (mv1 _),
    "mv2_incremental_delete" -> (mv2 _),
    "mv3_transactional_refresh" -> (mv3 _),
    "mv4_minmax_insert_only" -> (mv4 _),
    "mv12_kmv_sketch_view" -> (mv12 _),
    "mv5_hql_write_through" -> (mv5 _),
    "mv6_transparent_rewrite" -> (mv6 _),
    "mv7_join_view" -> (mv7 _),
  )

  override val oracles: Map[String, String] = Map(
    "mv11_distinct_elim" ->
      """SELECT DISTINCT o_orderkey, o_custkey
         FROM orders WHERE o_orderstatus != 'X'""",
    "mv9_join_rewrite" ->
      """SELECT o.o_custkey, o.o_orderkey, o.o_orderstatus, c.c_mktsegment
         FROM orders o
         JOIN (SELECT c_custkey AS o_custkey, c_mktsegment
               FROM customer) c ON o.o_custkey = c.o_custkey""",
    // the JOINED statement — the eliminated plan must still equal it
    "mv10_fk_join_elim" ->
      """SELECT o.o_orderstatus, count(*) AS n_orders,
           CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 AS sum_price
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         WHERE o.o_orderkey % 3 IN (0, 1)
         GROUP BY o.o_orderstatus""",
    "mv8_chained_view" ->
      """WITH c AS (SELECT c_custkey AS o_custkey, c_mktsegment
                    FROM customer WHERE c_custkey % 3 IN (0, 1)),
              o AS (SELECT o_orderkey, o_custkey,
                           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                             AS price_cents
                    FROM orders WHERE o_orderkey % 4 IN (0, 1))
         SELECT c.c_mktsegment, count(*) AS n_rows,
                CAST(sum(o.price_cents) AS BIGINT) AS sum_cents
         FROM o JOIN c ON o.o_custkey = c.o_custkey
         GROUP BY c.c_mktsegment""",
    "mv7_join_view" ->
      """WITH c AS (SELECT c_custkey AS o_custkey, c_mktsegment, c_nationkey
                    FROM customer WHERE c_custkey % 3 IN (0, 1, 2)),
              o AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                             AS price_cents
                    FROM orders WHERE o_orderkey % 4 IN (0, 1, 2))
         SELECT o.o_custkey, o.o_orderkey, o.o_orderstatus, o.price_cents,
                c.c_mktsegment, c.c_nationkey
         FROM o JOIN c ON o.o_custkey = c.o_custkey""",
    "mv1_incremental_agg" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty,
                CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
                  / 100.0 AS sum_price
         FROM lineitem GROUP BY 1, 2""",
    "mv2_incremental_delete" ->
      """SELECT l_orderkey, count(*) AS n_rows,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty
         FROM lineitem WHERE l_orderkey % 7 <> 0 GROUP BY 1""",
    "mv4_minmax_insert_only" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty,
                min(l_extendedprice) AS min_price,
                max(l_extendedprice) AS max_price
         FROM lineitem GROUP BY 1, 2""",
    // mv12: the maintained sketch column is batch-path-independent, so
    // the oracle states the same truth over the FULL base with a18's
    // KMV order-statistics algebra
    "mv12_kmv_sketch_view" ->
      """WITH hashed AS (
           SELECT DISTINCT l_returnflag AS key,
             CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
           FROM lineitem),
         topk AS (
           SELECT key, h FROM (
             SELECT key, h, row_number() OVER (
               PARTITION BY key ORDER BY h) AS rn
             FROM hashed) WHERE rn <= 256),
         sk AS (SELECT key, CAST(count(*) AS BIGINT) AS n_k, max(h) AS kth
                FROM topk GROUP BY key),
         base AS (SELECT l_returnflag AS key, count(*) AS n_rows,
                    CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT)
                      AS sum_qty
                  FROM lineitem GROUP BY 1)
         SELECT base.key AS l_returnflag, base.n_rows, base.sum_qty, sk.n_k,
           CASE WHEN sk.n_k < 256 THEN sk.n_k * 1000000
                ELSE CAST(floor((255.0 * 1152921504606846976.0 /
                       CAST(sk.kth AS DOUBLE)) * 1000000.0) AS BIGINT)
           END AS est_distinct_micro
         FROM base JOIN sk ON base.key = sk.key""",
    "mv5_hql_write_through" ->
      """WITH rows AS (
           SELECT CAST(o_custkey AS VARCHAR) AS student,
                  CAST(floor(o_totalprice) AS INTEGER) AS score
           FROM orders WHERE o_orderkey % 10 = 0
           UNION ALL
           SELECT CAST(o_custkey AS VARCHAR) AS student,
                  CAST(floor(o_totalprice) AS INTEGER) + 7 AS score
           FROM orders WHERE o_orderkey % 10 = 1)
         SELECT student, count(*) AS n_rows,
                CAST(sum(score) AS BIGINT) AS sum_score
         FROM rows GROUP BY 1""",
    // mv6 answers FROM THE VIEW (the gate asserts the plan reads only
    // view files); the oracle states the same truth over the base
    "mv6_transparent_rewrite" ->
      """SELECT l_returnflag, count(*) AS n_rows,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty,
                CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
                  / 100.0 AS sum_price
         FROM lineitem GROUP BY 1""",
    // the registry path lands on the same truth as mv1: the view's
    // definition over the full final base
    "mv3_transactional_refresh" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty,
                CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
                  / 100.0 AS sum_price
         FROM lineitem GROUP BY 1, 2""",
  )
}
