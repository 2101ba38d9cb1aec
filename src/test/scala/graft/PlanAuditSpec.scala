package graft

import org.apache.spark.sql.functions._

/** Physical-plan audits beyond RelationalSpec's: each hot operator must
  * compile to the plan SHAPE its scale story depends on — not just the
  * right rows. A regression here is a 100×-scale problem that no
  * row-level oracle would catch. */
class PlanAuditSpec extends SparkSpec {

  private def plan(pack: graft.queries.QueryPack, q: String): String =
    pack.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("HeroQL rank-filter compiles to WindowGroupLimit (partial + final)") {
    val p = plan(graft.queries.HeroQueries, "hq2_top3_per_partition")
    assert(p.contains("WindowGroupLimit"), s"no WindowGroupLimit:\n$p")
    assert(p.contains("Partial") && p.contains("Final"),
      "expected map-side partial group-limit before the shuffle")
  }

  test("a18 KMV is a bounded sketch: partial ObjectHashAggregate, one exchange of buffers, no distinct-set shuffle, no window") {
    val df = graft.queries.Relational.queries("a18_kmv_distinct")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"),
      s"KMV must plan as a TypedImperativeAggregate:\n$p")
    assert(p.contains("partial_kmvsketchagg"),
      s"map-side PARTIAL sketch must run before the exchange:\n$p")
    assert(!p.contains("Window"),
      s"the window form is the unbounded r14 shape this replaced:\n$p")
    val fmt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val shuffles = raw"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]".r
      .findAllMatchIn(fmt).map(_.group(1)).toSeq
    assert(shuffles.size == 1, s"exactly one exchange expected:\n$fmt")
    // the exchange must carry (key, serialized buffer ≤ k longs) — the
    // raw hash column crossing it would be the distinct-set shuffle
    assert(!shuffles.head.contains("h#"),
      s"raw hash column crosses the exchange: [${shuffles.head}]")
  }

  test("a19 theta set-ops sketch both halves bounded: partial values-agg, no raw hash across any exchange") {
    val df = graft.queries.Relational.queries("a19_theta_sketch_setops")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_kmvvaluesagg"),
      s"map-side PARTIAL sketch must run before the exchange:\n$p")
    assert(!p.contains("Window"), s"no window may replace the sketch:\n$p")
    val fmt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val shuffles = raw"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]".r
      .findAllMatchIn(fmt).map(_.group(1)).toSeq
    shuffles.foreach(cols => assert(!cols.contains("h#"),
      s"raw hash column crosses an exchange: [$cols]"))
  }

  test("a20 tuple sketch keeps the bounded shape: partial tuple-agg, no raw hash or value across the exchange") {
    val df = graft.queries.Relational.queries("a20_tuple_sketch_sum")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_kmvtupleagg"),
      s"map-side PARTIAL tuple sketch must run before the exchange:\n$p")
    val fmt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val shuffles = raw"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]".r
      .findAllMatchIn(fmt).map(_.group(1)).toSeq
    assert(shuffles.size == 1, s"exactly one exchange expected:\n$fmt")
    Seq("h#", "v#").foreach(c => assert(!shuffles.head.contains(c),
      s"raw column $c crosses the exchange: [${shuffles.head}]"))
  }

  test("a21 quantile sketch keeps the bounded shape: partial sample-agg, no raw hash/value across the exchange, no sort of the data") {
    val df = graft.queries.Relational.queries("a21_sketch_quantiles")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_kmvsampleagg"),
      s"map-side PARTIAL sample sketch must run before the exchange:\n$p")
    assert(!p.contains("Window"),
      s"a window/rank over raw rows is the unbounded shape this avoids:\n$p")
    val fmt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(raw"\(\d+\) Sort\b".r.findFirstIn(fmt).isEmpty,
      s"no Sort node may touch the raw rows (exact percentiles' cost):\n$fmt")
    val shuffles = raw"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]".r
      .findAllMatchIn(fmt).map(_.group(1)).toSeq
    assert(shuffles.size == 1, s"exactly one exchange expected:\n$fmt")
    Seq("h#", "v#").foreach(c => assert(!shuffles.head.contains(c),
      s"raw column $c crosses the exchange: [${shuffles.head}]"))
  }

  test("hq27 language-planned median sketch keeps a21's bounded shape end to end") {
    // the language route (parse -> analyze -> plan) must emit the same
    // physical shape the DataFrame gate pins: partial sample sketch
    // map-side, one exchange of <=k-pair buffers, no Sort/Window over
    // the raw rows
    val df = graft.queries.HeroQueries.queries("hq27_approx_median")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_kmvsampleaggnullable") ||
      p.contains("partial_kmvsampleagg"),
      s"map-side PARTIAL sample sketch must run before the exchange:\n$p")
    assert(!p.contains("Window"),
      s"a window/rank over raw rows is the unbounded shape this avoids:\n$p")
    val fmt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(raw"\(\d+\) Sort\b".r.findFirstIn(fmt).isEmpty,
      s"no Sort node may touch the raw rows:\n$fmt")
    val shuffles = raw"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]".r
      .findAllMatchIn(fmt).map(_.group(1)).toSeq
    assert(shuffles.size == 1, s"exactly one exchange expected:\n$fmt")
    Seq("rid#", "cents#").foreach(c => assert(!shuffles.head.contains(c),
      s"raw column $c crosses the exchange: [${shuffles.head}]"))
  }

  test("hq28 language-planned arbitrary-quantile sketch keeps a21's bounded shape") {
    val df = graft.queries.HeroQueries.queries("hq28_approx_quantile")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_kmvsampleaggnullable") ||
      p.contains("partial_kmvsampleagg"),
      s"map-side PARTIAL sample sketch must run before the exchange:\n$p")
    assert(!p.contains("Window"),
      s"a window/rank over raw rows is the unbounded shape this avoids:\n$p")
    val fmt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(raw"\(\d+\) Sort\b".r.findFirstIn(fmt).isEmpty,
      s"no Sort node may touch the raw rows:\n$fmt")
    val shuffles = raw"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]".r
      .findAllMatchIn(fmt).map(_.group(1)).toSeq
    assert(shuffles.size == 1, s"exactly one exchange expected:\n$fmt")
    Seq("rid#", "cents#").foreach(c => assert(!shuffles.head.contains(c),
      s"raw column $c crosses the exchange: [${shuffles.head}]"))
  }

  test("dd14c exact collapse exchanges (fp, doc_id) only — text never crosses the collapse shuffle") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val df = graft.queries.Dedup.fpCollapse(docs)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("HashAggregate"), s"collapse must partial-aggregate:\n$p")
    val fmt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val shuffles = raw"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]".r
      .findAllMatchIn(fmt).map(_.group(1)).toSeq
    assert(shuffles.size == 1, s"exactly one collapse exchange expected:\n$fmt")
    assert(!shuffles.head.contains("text#"),
      s"text crosses the collapse exchange: [${shuffles.head}]")
  }

  test("hq36 near_dedup from text: fp-keyed collapse present, text never a shuffle key, rows equal dd14c") {
    val viaText = graft.queries.Dedup.queries("hq36_near_dedup_hql")(spark, sf)
    val fmt = viaText.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // NO exchange in the parsed plan hashes raw text as its key (the
    // fp-collapse exchange itself sits behind the engine's pinned
    // localCheckpoint — the "dd14c exact collapse" pin covers it on
    // the shared fpCollapse directly)
    val keys = raw"hashpartitioning\(([^)]*)\)".r
      .findAllMatchIn(fmt).map(_.group(1)).toSeq
    assert(keys.forall(!_.startsWith("text#")),
      s"raw text used as a shuffle key: $keys")
    // identity to the Scala-API engine (same τ, same pipeline)
    val engine = graft.queries.Dedup.queries("dd14c_fp_layered_keeper")(spark, sf)
    assert(viaText.collect().map(_.toSeq).toSet ==
      engine.collect().map(_.toSeq).toSet,
      "near_dedup-from-text diverges from the layered keeper engine")
  }

  test("dd14c equals dd14b row for row (fp keying changes the exchange payload, not the decision)") {
    val b = graft.queries.Dedup.queries("dd14b_layered_lsh_keeper")(spark, sf)
    val c = graft.queries.Dedup.queries("dd14c_fp_layered_keeper")(spark, sf)
    assert(c.exceptAll(b).isEmpty && b.exceptAll(c).isEmpty,
      "fp-keyed layering must reproduce the text-keyed decision on a collision-free corpus")
  }

  test("dd5 all-pairs cosine broadcasts one side (no shuffle of the pair stream)") {
    val p = plan(graft.queries.Dedup, "dd5_embedding_neardup")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"embedding pair join must broadcast:\n$p")
  }

  test("ann1 probe set is broadcast against the corpus scan") {
    val p = plan(graft.queries.Similarity, "ann1_bruteforce_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"probe side must broadcast:\n$p")
  }

  test("ann4 ADC scan broadcasts probe LUTs against codes; full vectors only for candidates") {
    val p = plan(graft.queries.Similarity, "ann4_pq_adc_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"probe LUTs must broadcast against the code scan:\n$p")
    // every SHUFFLE exchange must carry narrow rows: the formatted plan
    // lists each node's Input columns — no shuffle may move the LUT,
    // the codes, or any full vector (embedding/vp/vn/pu). Broadcast
    // exchanges are exempt (the ~probes×CAND candidate set legitimately
    // broadcasts with probe vectors attached).
    val fmt = graft.queries.Similarity.queries("ann4_pq_adc_topk")(spark, sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val shuffles = raw"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]".r
      .findAllMatchIn(fmt).map(_.group(1)).toSeq
    assert(shuffles.nonEmpty, s"no shuffle exchange found:\n$fmt")
    // codes ARE allowed across a shuffle — moving the 8-byte compressed
    // representation instead of the 256-byte vector is the point
    val wide = Seq("lut#", "embedding#", "vp#", "vn#", "pu#")
    shuffles.foreach { cols =>
      wide.foreach(w => assert(!cols.contains(w),
        s"wide column $w crosses a shuffle exchange: [$cols]"))
    }
  }

  test("ann5 IVF+PQ scans via a broadcast HASH join on the list id; no vector crosses a shuffle") {
    val df = graft.queries.Similarity.queries("ann5_ivfpq_topk")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // the sublinearity claim: candidate generation must be an equi-join
    // on the coarse list id, never a nested-loop pair enumeration
    assert(p.contains("BroadcastHashJoin [list"),
      s"ADC scan must equi-join on the list id:\n$p")
    val fmt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val shuffles = raw"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]".r
      .findAllMatchIn(fmt).map(_.group(1)).toSeq
    val wide = Seq("lut#", "embedding#", "vp#", "vn#", "pu#")
    shuffles.foreach { cols =>
      wide.foreach(w => assert(!cols.contains(w),
        s"wide column $w crosses a shuffle exchange: [$cols]"))
    }
    // the index projection must be the ONLY node carrying corpus-side
    // PqEncode calls — a nullable list once dragged the encode into a
    // pushed isnotnull Filter, doubling the per-row encode cost
    def nodes(n: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = n match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        nodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q +: nodes(q.plan)
      case other => other +: other.children.flatMap(nodes)
    }
    val carrying = nodes(df.queryExecution.executedPlan).filter(n =>
      n.expressions.exists(_.collectFirst {
        case e: graft.functions.VectorFns.PqEncode => e
      }.nonEmpty))
    // exactly the corpus index projection (the probe side uses the HOF
    // LUT, not PqEncode)
    assert(carrying.size == 1,
      s"PqEncode must appear in exactly one plan node, found ${carrying.size}")
  }

  test("ann7 residual IVF-PQ keeps ann5's plan shape: list equi-join, codes-only exchange") {
    val df = graft.queries.Similarity.queries("ann7_ivfpq_residual_topk")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin [list"),
      s"residual ADC scan must equi-join on the list id:\n$p")
    // the fused encode must live in exactly ONE plan node (the corpus
    // projection) — a second node carrying it would be a second
    // full-vector pass over the corpus. Within that projection the
    // expression may be REFERENCED once per extracted struct field;
    // whole-stage codegen's subexpression elimination evaluates equal
    // instances once per row, so node-count is the honest contract.
    def nodes(n: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = n match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        nodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q +: nodes(q.plan)
      case other => other +: other.children.flatMap(nodes)
    }
    val carrying = nodes(df.queryExecution.executedPlan).filter(n =>
      n.expressions.exists(_.collectFirst {
        case e: graft.functions.VectorFns.IvfPqEncodeExpr => e
      }.nonEmpty))
    assert(carrying.size == 1,
      s"fused residual encode must appear in exactly one plan node, " +
        s"found ${carrying.size}:\n${carrying.mkString("\n---\n")}")
    val fmt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val shuffles = raw"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]".r
      .findAllMatchIn(fmt).map(_.group(1)).toSeq
    val wide = Seq("lut#", "embedding#", "vp#", "vn#", "pu#")
    shuffles.foreach { cols =>
      wide.foreach(w => assert(!cols.contains(w),
        s"wide column $w crosses a shuffle exchange: [$cols]"))
    }
  }

  test("tx8 unigram LM: bounded model broadcast, raw text never crosses an exchange") {
    val df = graft.queries.TextAnalysis.queries("tx8_unigram_logprob")(spark, sf)
    val fmt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the top-V model and the 1-row total must reach the scoring scan
    // as broadcasts, not shuffled joins
    assert(fmt.contains("BroadcastHashJoin") || fmt.contains("BroadcastNestedLoopJoin"),
      s"LM must broadcast to the scoring side:\n$fmt")
    val shuffles = raw"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]".r
      .findAllMatchIn(fmt).map(_.group(1)).toSeq
    assert(shuffles.nonEmpty, "expected the token-count exchange")
    shuffles.foreach { cols =>
      assert(!cols.contains("text#"),
        s"raw text crosses a shuffle exchange: [$cols]")
    }
  }

  test("hq18 language-surface dedup shuffles the 8-byte fingerprint, not text") {
    val p = plan(graft.queries.HeroQueries, "hq18_fingerprint_dedup")
    assert(p.contains("hashpartitioning(fp"),
      s"keeper exchange must partition on fp:\n$p")
    assert(!p.contains("hashpartitioning(text"),
      s"raw text must not cross an exchange:\n$p")
  }

  test("j12 keyless range join bands into an equi-join, never a nested loop") {
    val p = plan(graft.queries.Relational, "j12_banded_range_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"keyless interval join must band to an equi-join:\n$p")
    assert(p.contains("__band"), s"band key missing from the join plan:\n$p")
  }

  test("hq31 range_agg from text plans the segment tree: equi-join on tree nodes, no pair join") {
    val p = plan(graft.queries.Relational, "hq31_range_agg_hql")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"range_agg must never enumerate pairs:\n$p")
    // the tree probe joins on (lvl, node) — the RangeCount signature
    assert(p.contains("lvl"), s"segment-tree node join missing:\n$p")
  }

  test("hq34 semantic_dedup from text plans the layered pipeline: value-collapse exchange, no cartesian pair search") {
    val p = plan(graft.queries.Dedup, "hq34_semantic_dedup_hql")
    // layer 0's exact-value collapse: the groupBy(embedding) exchange
    // must be present — it is what bounds the pair search under
    // replication (dd9b's r18 lesson; without it replica cliques keep
    // the search quadratic no matter the centroid count)
    assert(p.contains("hashpartitioning(embedding"),
      s"value-collapse exchange missing from the parsed plan:\n$p")
    // the only pair-shaped join allowed is the broadcast centroid
    // assignment; an unbanded cartesian over rows would be the raw
    // all-pairs shape the stage exists to prevent
    assert(!p.contains("CartesianProduct"),
      s"semantic_dedup from text must never enumerate raw pairs:\n$p")
    // the cluster-local pair search keys on the assignment
    assert(p.contains("cluster_id"),
      s"cluster-keyed pair search missing:\n$p")
  }

  test("hq35 nearest from text is index-backed: no cartesian cosine, candidate join keys on list") {
    val p = plan(graft.queries.Similarity, "hq35_nearest_hql")
    assert(!p.contains("CartesianProduct"),
      s"nearest from text must never brute-force all pairs:\n$p")
    // candidate generation is the list-keyed equi-join against the
    // stored index — the scan-budgeted shape the stage exists to reach
    assert(p.contains("list"),
      s"list-keyed candidate join missing from the parsed plan:\n$p")
  }

  test("tx10 BM25 scores map-only; the only exchange feeds the top-k window") {
    val df = graft.queries.TextAnalysis.queries("tx10_bm25_topk")(spark, sf)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val shuffles = p.linesIterator.count(_.trim.startsWith("Exchange"))
    // ONE exchange in the scoring plan: the per-query window partition
    // (the stats scan is a separate collected job)
    assert(shuffles <= 1, s"BM25 scoring must not shuffle documents:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"top-k per query should prune map-side:\n$p")
  }

  test("j13 spatial join bands into a cell-keyed equi-join, never a nested loop") {
    val p = plan(graft.queries.Relational, "j13_grid_spatial_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"keyless box join must band to a cell equi-join:\n$p")
    assert(p.contains("cx") && p.contains("cy"),
      s"cell keys missing from the join plan:\n$p")
  }

  test("tx9 line-repetition filters are map-only: no exchange anywhere") {
    val p = plan(graft.queries.TextAnalysis, "tx9_gopher_lines")
    assert(!p.contains("Exchange"),
      s"per-document line/gram stats must not shuffle:\n$p")
  }

  test("samp1 stratified sample is map-only: no exchange anywhere in the plan") {
    val p = plan(graft.queries.TrainingSetQueries, "samp1_stratified_sample")
    assert(!p.contains("Exchange"),
      s"hash-keyed sampling must not shuffle:\n$p")
  }

  test("dc1 decontamination joins on the gram fingerprint, never all-pairs") {
    val p = plan(graft.queries.TrainingSetQueries, "dc1_decontamination")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"contamination check must be an equi-join on the gram hash:\n$p")
    assert(p.contains("gram_fp"), s"join key must be the 8-byte fingerprint:\n$p")
  }

  test("salted skew join shuffles on (key, salt), not the key alone") {
    val p = plan(graft.queries.Relational, "j11_salted_skew_join")
    assert(p.contains("__salt"), s"salt missing from exchange:\n$p")
  }

  test("asof join is one window pass, not a per-row lookup join") {
    val p = plan(graft.queries.Relational, "j9_asof_join")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"),
      s"expected window-based asof:\n$p")
    assert(!p.contains("CartesianProduct"), "asof must not enumerate pairs")
  }

  test("SizeGate: broadcast hint under the cap, plain join over it") {
    val small = spark.range(10).toDF("k")
    val big = spark.range(1000).toDF("k")
    val under = big.join(graft.operators.SizeGate.maybeBroadcast(small, 10, 100), "k")
    assert(under.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"),
      "hint within cap must plan a broadcast join")
    // over the cap (forced via conf=0) and with auto-broadcast off, the
    // join must degrade to a co-located shuffle join — the 100 TB shape
    spark.conf.set(graft.operators.SizeGate.MaxRowsConf, "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val over = big.join(graft.operators.SizeGate.maybeBroadcast(small, 10, 100), "k")
      val p = over.queryExecution.sparkPlan.toString
      assert(!p.contains("Broadcast"), s"gate failed to suppress broadcast:\n$p")
    } finally {
      spark.conf.unset(graft.operators.SizeGate.MaxRowsConf)
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("fixpoint functional closure: shuffle fallback derives the same closure") {
    import spark.implicits._
    // depth-9 binary-ish hierarchy: node i's parent is i/2
    val edges = (2 to 512).map(i => (i.toLong, (i / 2).toLong)).toDF("child", "parent")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaBroadcast = rows(graft.operators.Fixpoint.transitiveClosureFunctional(edges))
    spark.conf.set(graft.operators.SizeGate.MaxRowsConf, "0")
    try {
      val viaShuffle = rows(graft.operators.Fixpoint.transitiveClosureFunctional(edges))
      assert(viaShuffle == viaBroadcast,
        "closure differs between broadcast and shuffle-fallback paths")
    } finally spark.conf.unset(graft.operators.SizeGate.MaxRowsConf)
  }

  test("pipe1 composed pipeline is exactly two shuffles at any input size") {
    val p = plan(graft.queries.PipelineQueries, "pipe1_training_pipeline")
    val shuffles = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles == 2,
      s"expected dedup + final agg as the ONLY shuffles, found $shuffles:\n$p")
    assert(p.contains("partial_"),
      "final aggregate must have a map-side partial phase")
  }

  test("pipe2 dedup exchange partitions on the 8-byte fingerprint, still two shuffles") {
    val p = plan(graft.queries.PipelineQueries, "pipe2_fingerprint_pipeline")
    val shuffles = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(shuffles.size == 2,
      s"expected dedup + final agg as the ONLY shuffles, found ${shuffles.size}:\n$p")
    // the keeper exchange must carry the long fingerprint, not raw text
    assert(shuffles.exists(_.contains("hashpartitioning(fp")),
      s"dedup exchange does not partition on fp:\n${shuffles.mkString("\n")}")
  }

  test("dd6 incremental dedup broadcasts the batch, corpus side unshuffled pre-join") {
    val p = plan(graft.queries.Dedup, "dd6_incremental_dedup")
    assert(p.contains("BroadcastHashJoin"),
      s"batch side must broadcast against the streamed corpus:\n$p")
    val shuffles = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles == 1,
      s"only the keeper aggregation may shuffle, found $shuffles:\n$p")
  }

  test("dd8 chunk dedup shuffles fingerprints, never chunk strings, and partial-aggregates") {
    val p = plan(graft.queries.Dedup, "dd8_chunk_dedup")
    assert(p.contains("hashpartitioning(chunk_fp"),
      s"span dedup must partition on the chunk fingerprint:\n$p")
    assert(!p.contains("hashpartitioning(col"),
      s"raw chunk strings must not cross an exchange:\n$p")
    // viral spans (boilerplate) make fp a skewed key: the first-occurrence
    // choice must be a map-side-combined min, not a window sort that
    // funnels every occurrence of a hot fp into one task
    assert(p.contains("partial_min"),
      s"first-occurrence min must have a map-side partial phase:\n$p")
    assert(!p.contains("Window"), s"span dedup must not use a window sort:\n$p")
  }

  test("pack1 sequence packing is one shard-keyed exchange, no global sort") {
    val p = plan(graft.queries.TrainingSetQueries, "pack1_sequence_packing")
    val shuffles = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(shuffles.size == 1,
      s"expected only the per-shard window exchange, found ${shuffles.size}:\n$p")
    assert(shuffles.head.contains("hashpartitioning(shard"),
      s"window must partition on shard:\n${shuffles.head}")
    assert(!p.contains("rangepartitioning"),
      s"packing must not globally sort:\n$p")
  }

  test("tx6b histogram cut broadcasts thresholds; the corpus is never sorted") {
    val p = plan(graft.queries.TextAnalysis, "tx6b_quantile_histogram")
    assert(p.contains("BroadcastHashJoin"),
      s"per-language cuts must come back as a broadcast:\n$p")
    assert(!p.contains("rangepartitioning"),
      s"the corpus must not be globally sorted for a histogram quantile:\n$p")
  }

  test("pack3 epoch shuffle is one shard-keyed exchange, no global sort") {
    val p = plan(graft.queries.TrainingSetQueries, "pack3_epoch_shuffle")
    val shuffles = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(shuffles.size == 1,
      s"expected only the per-shard window exchange, found ${shuffles.size}:\n$p")
    assert(shuffles.head.contains("hashpartitioning(shard"),
      s"window must partition on shard:\n${shuffles.head}")
    assert(!p.contains("rangepartitioning"),
      s"epoch shuffle must not globally sort:\n$p")
  }

  test("planner fixpoint result scans only materialized deltas, never re-runs a source plan") {
    import spark.implicits._
    // the accumulator a fixpoint returns must be a union of per-round
    // checkpointed deltas (ExistingRDD scans): at depth d the plan is d
    // cheap scans of already-written blocks — if a source plan leaked
    // into it, every downstream action would recompute the whole loop
    val src =
      """data E(child: int64, parent: int64).
        |query Reach(child: int64, anc: int64)
        |:- E(child, anc)
        |;  E(child, mid), Reach(mid, anc)
        |.""".stripMargin
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("child", "parent")
    val df = graft.heroql.HeroQL.compile(src, "Reach", Map("E" -> edges))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Scan ExistingRDD"), s"no materialized delta scan:\n$p")
    assert(!p.contains("Join") && !p.contains("Exchange"),
      s"fixpoint result must not re-derive (joins belong to the finished loop):\n$p")
  }

  test("g11 co-purchase top-k is TakeOrdered, never a global sort") {
    val p = plan(graft.queries.GraphQueries, "g11_copurchase")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-100 must run as per-partition heaps + one k-row merge:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"pair generation must stay an order-keyed equi-join:\n$p")
  }

  test("adm16 profile runs in ONE scan (multi-distinct via Expand, no re-read)") {
    val df = graft.queries.AdminQueries.queries("adm16_table_profile")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    val scans = p.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"expected a single orders scan, saw $scans:\n$p")
    assert(p.contains("Expand"),
      s"6-way count(distinct) should plan as one Expand over one scan:\n$p")
  }

  test("cq5 six-table language join: dims broadcast, no cartesian, one scan each") {
    val df = graft.queries.CollectionQueries.queries("cq5_tpch_q5_shape")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"every join must stay an equi-join:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"region/nation/supplier must broadcast into the probe side:\n$p")
  }

  test("samp8 token budget: ONE source-keyed exchange for rank AND running sum") {
    val df = graft.queries.TrainingSetQueries.queries("samp8_token_budget")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    val shuffles = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(shuffles.size == 1 && shuffles.head.contains("source"),
      s"the window pass must not re-shuffle:\n$p")
  }

  test("ev10 pattern islands: three windows + aggregate, ONE user-keyed exchange") {
    val df = graft.queries.EventAnalytics.queries("ev10_pattern_islands")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    val shuffles = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(shuffles.size == 1 && shuffles.head.contains("user_id"),
      s"(user, island) windows must reuse the user_id partitioning:\n$p")
  }

  test("tx18 chunking is map-only: no exchange anywhere in the plan") {
    val df = graft.queries.TextAnalysis.queries("tx18_chunking")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"chunking must not shuffle:\n$p")
  }

  test("ev9 anomaly window shuffles once, keyed by user_id") {
    val df = graft.queries.EventAnalytics.queries("ev9_anomaly_zscore")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    val shuffles = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(shuffles.size == 1 && shuffles.head.contains("user_id"),
      s"expected exactly one user-keyed exchange:\n$p")
  }

  test("scan projection prunes to the read schema on the documents table") {
    val p = plan(graft.queries.TextAnalysis, "tx4_fingerprint")
    // fingerprint reads doc_id + text only; the scan must not read lang/source
    val scan = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(scan.contains("doc_id") && scan.contains("text"), s"scan: $scan")
    assert(!scan.contains("source"), s"unprojected column read: $scan")
  }
}
