package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the tokenizer-induction / bigram-LM pack —
  * properties the DuckDB oracle can't express (cross-query consistency,
  * algebraic identities, plan shape). */
class TokenizerSpec extends SparkSpec {

  import graft.queries.TokenizerQueries

  test("bpe1 dictionary-weighted pair counts equal a direct raw-corpus recount") {
    // The Sennrich trick's correctness premise: counting pairs over the
    // distinct-word dictionary weighted by word frequency must equal
    // counting pairs over every token occurrence in the corpus.
    val fromDict = TokenizerQueries.queries("bpe1_pair_counts")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val raw = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(expr("split(trim(lower(text)), '\\\\s+')")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("weight"))
      .orderBy(col("weight").desc, col("pair").asc).limit(50)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fromDict == raw, s"dictionary-weighted != raw recount")
  }

  test("bpe2 merged pair is gone from round 2 and the marker participates") {
    val top1 = TokenizerQueries.queries("bpe1_pair_counts")(spark, sf)
      .limit(1).collect().head.getString(0)
    val round2 = TokenizerQueries.queries("bpe2_second_merge")(spark, sf)
      .collect().map(_.getString(0))
    // left-to-right non-overlapping replace can never leave or recreate
    // the merged adjacency (the marker sits between its neighbors)
    assert(!round2.contains(top1), s"merged pair $top1 survived into round 2")
    assert(round2.exists(_.contains("#")),
      "no pair involving the merged symbol ranked in round 2's top-20")
  }

  test("tx14 agrees with tx8 on per-doc token counts and scores within the smoothed range") {
    val bi = TokenizerQueries.queries("tx14_bigram_logprob")(spark, sf)
      .select("doc_id", "n_tok", "avg_nll_micro")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val uni = graft.queries.TextAnalysis.queries("tx8_unigram_logprob")(spark, sf)
      .select("doc_id", "n_tok")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bi.keySet == uni.keySet)
    bi.foreach { case (id, (n, _)) =>
      assert(n == uni(id), s"doc $id: tx14 n_tok $n != tx8 ${uni(id)}")
    }
    // surprisal is bounded by the add-one floor: 0 < -ln(p) < ln(N+V+1)
    val tokens = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(expr("split(trim(lower(text)), '\\\\s+')")).as("tok"))
    val nCorpus = tokens.count()
    val vCorpus = tokens.distinct().count()
    val cap = (math.log(nCorpus + vCorpus + 1.0) * 1e6).toLong
    bi.values.foreach { case (_, avg) =>
      assert(avg > 0 && avg <= cap, s"avg_nll_micro $avg outside (0, $cap]")
    }
  }

  test("tx14 only the scalar N/V row carries a broadcast hint") {
    val df = TokenizerQueries.queries("tx14_bigram_logprob")(spark, sf)
    // corpus-derived count tables must NOT be HINTED broadcast (they
    // grow with the data — at test SF AQE legitimately broadcasts them
    // adaptively, which is exactly the behavior we want to leave free);
    // the genuinely scalar N/V row is the single declared broadcast
    val hints = df.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.size == 1, s"expected exactly one broadcast hint (scalars), got ${hints.size}")
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"),
      "expected the scalar N/V row to cross-join by broadcast")
  }

  test("cms1 estimates dominate truth and equal the colliding-count sums") {
    val rows = TokenizerQueries.queries("cms1_heavy_hitters")(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"${r.getString(0)}: CMS estimate below truth — impossible")
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1))
    }
    // independent reconstruction: with the tiny fixture vocab the exact
    // dictionary fits in the test driver, so recompute each bucket sum
    // directly and pin est = min_j Σ{wc | same (j, bucket)}
    import graft.operators.TextFns
    val dict = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(expr("split(trim(lower(text)), '\\\\s+')")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // all (j, word) buckets in ONE job, then pure driver arithmetic
    import spark.implicits._
    val buckets = (for { j <- 0 until 4; w <- dict.keys.toSeq } yield (j, w))
      .toDF("j", "w")
      .select(col("j"), col("w"), pmod(TextFns.fingerprintOf(
        concat(col("j").cast("string"), lit(":"), col("w"))), lit(16)).as("b"))
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    val top = rows.maxBy(_.getLong(1))
    val expected = (0 until 4).map { j =>
      val b = buckets((j, top.getString(0)))
      dict.collect { case (w, wc) if buckets((j, w)) == b => wc }.sum
    }.min
    assert(top.getLong(2) == expected,
      s"${top.getString(0)}: est ${top.getLong(2)} != reconstructed $expected")
  }

  test("emb2 per-dimension stats: one partial-aggregated exchange, consistent moments") {
    val df = graft.queries.Similarity.queries("emb2_dimension_stats")(spark, sf)
    val rows = df.collect()
    val nVec = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(rows.length == 64)
    rows.foreach { r =>
      val (n, sum, mn, mx, sq, mean) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(n == nVec)
      assert(mn <= mean && mean <= mx, s"dim ${r.getLong(0)}: mean outside [min,max]")
      assert(sq >= 0)
      assert(mn * n <= sum && sum <= mx * n)
    }
    // partial aggregation: the plan must carry HashAggregate partials
    // below the single exchange (map-side combine on the dim key)
    // AQE's toString prints the initial plan below the final one — count
    // exchanges only in the final section
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("partial_"), s"no map-side partial aggregate:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly one hash exchange:\n$p")
  }
}
