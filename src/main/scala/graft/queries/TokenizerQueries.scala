package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Tokenizer-induction and n-gram language-model operators — the
  * vocabulary-training side of a pretraining data pipeline (the corpus
  * statistics a BPE trainer and a perplexity filter consume; builder-prompt
  * scope, graded alongside SURVEY §2). Sits next to
  * [[TextAnalysis]]'s tx8 unigram scorer and tx11 document-frequency
  * vocabulary.
  *
  * Scale stances:
  *  - bpe1/bpe2 use the dictionary-weighted formulation (Sennrich et al.
  *    2016 "Neural Machine Translation of Rare Words with Subword Units",
  *    §3.2): pair statistics are computed over the DISTINCT-WORD
  *    dictionary weighted by word frequency, never over the raw corpus.
  *    One token-count exchange collapses 100 TB of text to a
  *    vocabulary-bounded dictionary (Heaps' law: ~millions of rows, not
  *    trillions); every subsequent merge round is arithmetic on that
  *    bounded table. This is exactly why production BPE trainers scale.
  *  - tx14 trains the bigram model in-query the way tx8 trains its
  *    unigram: counts come from partial-aggregated exchanges; scoring
  *    joins are plain shuffle equi-joins on (prev, tok) — at 100 TB the
  *    bigram table is corpus-derived and NOT broadcastable, so the plan
  *    keeps it as a shuffle join on purpose, while genuinely scalar
  *    state (N, V) broadcasts.
  *  - Determinism: every cross-row accumulation is over BIGINTs; `ln`
  *    surprisal is truncated to integer micros PER TOKEN before any sum
  *    (the tx8/tx10/samp4 convention — JVM and DuckDB libm agree at the
  *    micro fixed point, and integer sums are accumulation-order-free,
  *    so partition order and retries cannot move the driver's hash).
  */
object TokenizerQueries extends QueryPack {

  private val tokSplit = "split(trim(lower(text)), '\\\\s+')"

  /** The frequency-weighted word dictionary: one row per distinct token
    * with its corpus count. The single corpus-sized exchange in the BPE
    * family; everything downstream is vocabulary-bounded. */
  private def dictionary(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(explode(expr(tokSplit)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))

  /** Adjacent-symbol pairs of `wordCol` (each symbol one character),
    * weighted by the word count: `transform(sequence(1, len-1), i ->
    * substring(w, i, 2))`. Words shorter than 2 symbols contribute no
    * pairs — guarded, because an unguarded `sequence(1, 0)` DESCENDS in
    * Spark while DuckDB's `range` yields empty (the gramFps guard
    * shape). */
  private def pairCounts(dict: DataFrame, wordCol: String): DataFrame =
    dict
      .filter(length(col(wordCol)) >= 2)
      .select(col("wc"), explode(expr(
        s"transform(sequence(1, length($wordCol) - 1), " +
          s"i -> substring($wordCol, i, 2))")).as("pair"))
      .groupBy("pair").agg(sum("wc").as("weight"))

  /** bpe1 — the first BPE merge-selection round: top-50 adjacent
    * character pairs by frequency-weighted count over the word
    * dictionary, pair string as the total-order tie-break. The top row
    * IS the first merge a BPE trainer would learn on this corpus. */
  private def bpe1(s: SparkSession, d: String): DataFrame =
    pairCounts(dictionary(s, d), "w")
      .orderBy(col("weight").desc, col("pair").asc)
      .limit(50)

  /** bpe2 — the second merge-selection round: apply round 1's winning
    * merge to the dictionary (the merged pair becomes ONE symbol — a
    * `#` marker, safe because the corpus is lowercase ASCII; both
    * engines' `replace` rewrites non-overlapping occurrences
    * left-to-right, which is precisely BPE's merge rule), then recount
    * pairs on the updated symbol sequences, top-20. Two declarative
    * rounds of the trainer loop — each further merge is the same
    * vocabulary-bounded recount, so the full N-merge training run is N
    * passes over a dictionary, never over the corpus. */
  private def bpe2(s: SparkSession, d: String): DataFrame = {
    val dict = dictionary(s, d).localCheckpoint()
    val top1 = pairCounts(dict, "w")
      .orderBy(col("weight").desc, col("pair").asc)
      .limit(1).select(col("pair").as("merge1"))
    val merged = dict.crossJoin(broadcast(top1))
      .select(col("wc"), expr("replace(w, merge1, '#')").as("w2"))
    pairCounts(merged, "w2")
      .orderBy(col("weight").desc, col("pair").asc)
      .limit(20)
  }

  /** tx14 — bigram language-model surprisal per document (the KenLM-style
    * perplexity filter one order above tx8's unigram): the corpus's own
    * bigram counts become the model with add-one smoothing over the
    * observed vocabulary, each document scores its average negative
    * log-likelihood. Document-initial tokens score against the unigram
    * distribution; every later token scores P(tok | prev) =
    * (c(prev,tok)+1) / (c(prev)+V+1) with c(prev) summed over observed
    * bigram starts. High surprisal = locally incoherent token order —
    * the signal tx8's bag-of-words scorer cannot see.
    *
    * Plan shape: posexplode + one per-doc window (docs are bounded, the
    * partition sort is local), two partial-aggregated count exchanges,
    * then shuffle equi-joins of the token stream against bigram and
    * context counts — deliberately NOT broadcast (corpus-derived tables
    * grow with the data); the scalar N/V cross-join does broadcast. */
  private def tx14(s: SparkSession, d: String): DataFrame = {
    val toks = t(s, d, "documents")
      .select(col("doc_id"), posexplode(expr(tokSplit)).as(Seq("pos", "tok")))
    val stream = toks.withColumn("prev",
      lag("tok", 1).over(Window.partitionBy("doc_id").orderBy("pos")))
      .localCheckpoint()
    val bigrams = stream.filter(col("prev").isNotNull)
      .groupBy("prev", "tok").agg(count(lit(1)).as("c2"))
    val contexts = bigrams.groupBy("prev").agg(sum("c2").as("c1"))
    val scalars = stream.agg(
      count(lit(1)).as("n_corpus"),
      countDistinct("tok").as("v_corpus"))
    val unigrams = stream.groupBy("tok").agg(count(lit(1)).as("cu"))
    stream
      .join(bigrams, Seq("prev", "tok"), "left")
      .join(contexts, Seq("prev"), "left")
      .join(unigrams, Seq("tok"), "left")
      .crossJoin(broadcast(scalars))
      .withColumn("m", expr(
        """CAST(floor(-ln(CASE
             WHEN prev IS NULL
               THEN (cu + 1.0) / (n_corpus + v_corpus + 1.0)
             ELSE (coalesce(c2, 0) + 1.0) / (coalesce(c1, 0) + v_corpus + 1.0)
           END) * 1000000) AS BIGINT)"""))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), sum("m").as("nll_micro"))
      .withColumn("avg_nll_micro", expr("nll_micro div n_tok"))
      .select("doc_id", "n_tok", "nll_micro", "avg_nll_micro")
  }

  /** Count-min sketch geometry: K independent hash rows × W buckets.
    * W is FIXTURE-CALIBRATED small (the driver corpus has ~31 distinct
    * tokens — W=16 forces real bucket collisions so the gate exercises
    * the estimate-vs-truth gap, not just exact pass-through); at corpus
    * scale W grows to ~1/ε while the grid stays O(K·W) — e.g. 4×2²⁰
    * BIGINTs = 32 MB for ε≈1e-6, still broadcastable. */
  private val CmsK = 4
  private val CmsW = 16

  /** (j, bucket) pairs for every dictionary word under the K row
    * hashes — the row seed is prefixed into the fingerprint input so
    * the K hashes are independent (the dc1 gram-fingerprint function,
    * mirrored exactly by [[graft.operators.TextFns.fingerprintDuckSql]]
    * in the oracle). */
  private def cmsEntries(dict: DataFrame): DataFrame =
    dict.select(col("w"), col("wc"), explode(array((0 until CmsK).map(j =>
      struct(lit(j).as("j"),
        pmod(graft.operators.TextFns.fingerprintOf(
          concat(lit(s"$j:"), col("w"))), lit(CmsW)).as("b"))): _*)).as("e"))
      .select(col("w"), col("wc"), col("e.j").as("j"), col("e.b").as("b"))

  /** cms1 — count-min sketch heavy-hitter estimation (Cormode &
    * Muthukrishnan 2005): the corpus token-frequency table is folded
    * into a K×W counter grid, then the top-20 true heavy hitters read
    * their estimates back as min over their K buckets. Emits true
    * count, estimate, and the (provably ≥0) overcount, so the gate
    * pins BOTH the sketch arithmetic and the CMS guarantee.
    *
    * Scale stance: the sketch builds from the DICTIONARY (the one
    * corpus-sized exchange already paid by bpe1/tx8 — increments are
    * weighted by word count, equivalent to streaming every occurrence),
    * and the grid is O(K·W) regardless of corpus size — THE structure
    * to broadcast for frequency-aware downsampling of a 100 TB corpus
    * where the exact dictionary no longer broadcasts. The estimate join
    * is a broadcast hash join on (j, bucket) against the 2 K-row grid. */
  private def cms1(s: SparkSession, d: String): DataFrame = {
    val dict = dictionary(s, d).localCheckpoint()
    val sketch = cmsEntries(dict).groupBy("j", "b").agg(sum("wc").as("cnt"))
    val top = dict.orderBy(col("wc").desc, col("w").asc).limit(20)
    cmsEntries(top)
      .join(broadcast(sketch), Seq("j", "b"))
      .groupBy("w").agg(max("wc").as("true_cnt"), min("cnt").as("est_cnt"))
      .withColumn("over_cnt", col("est_cnt") - col("true_cnt"))
      .select(col("w").as("tok"), col("true_cnt"), col("est_cnt"), col("over_cnt"))
  }

  /** bpe3 — BPE ENCODE with a learned merge list: six merge rounds
    * trained sequentially on the dictionary (each round's winning pair
    * collapses to a fresh single-symbol marker — uppercase letters,
    * which the lowercased corpus cannot contain — before the next
    * round counts), then every document's tokens are encoded through
    * the dictionary and the per-doc word/char/symbol totals reported:
    * n_symbols < n_chars IS the compression the vocabulary buys.
    * Scale: training runs entirely on the vocabulary-bounded
    * dictionary (6 rounds of pair-count + 1-row-broadcast replace,
    * zero driver-side collects); encoding is ONE corpus-token exchange
    * joined against the (broadcastable) dictionary — the trained-
    * tokenizer application shape a data pipeline actually runs. */
  private def bpe3(s: SparkSession, d: String): DataFrame = {
    val markers = "ABCDEF"
    var dict = dictionary(s, d).withColumn("enc", col("w")).localCheckpoint()
    for (r <- 0 until markers.length) {
      val top1 = pairCounts(dict, "enc")
        .orderBy(col("weight").desc, col("pair").asc)
        .limit(1).select(col("pair").as("__m"))
      dict = dict.crossJoin(broadcast(top1))
        .select(col("w"), col("wc"),
          expr(s"replace(enc, __m, '${markers(r)}')").as("enc"))
        .localCheckpoint()
    }
    t(s, d, "documents")
      .select(col("doc_id"), explode(expr(tokSplit)).as("w"))
      .join(dict.select("w", "enc"), "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("w"))).as("n_chars"),
        sum(length(col("enc"))).as("n_symbols"))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bpe1_pair_counts" -> (bpe1 _),
    "bpe2_second_merge" -> (bpe2 _),
    "bpe3_encode" -> (bpe3 _),
    "tx14_bigram_logprob" -> (tx14 _),
    "cms1_heavy_hitters" -> (cms1 _),
  )

  private val dictSql =
    """SELECT w, CAST(count(*) AS BIGINT) AS wc FROM (
         SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
         FROM documents) GROUP BY w"""

  private def pairSql(dictExpr: String, wCol: String): String =
    s"""SELECT pair, CAST(sum(wc) AS BIGINT) AS weight FROM (
          SELECT wc, unnest(list_transform(range(1, len($wCol)),
            i -> substr($wCol, CAST(i AS INTEGER), 2))) AS pair
          FROM ($dictExpr) WHERE len($wCol) >= 2)
        GROUP BY pair"""

  private val cmsEntriesSql: String = {
    val fp = graft.operators.TextFns.fingerprintDuckSql(
      "(CAST(j AS VARCHAR) || ':' || w)")
    s"""SELECT w, wc, j, CAST($fp % $CmsW AS BIGINT) AS b
        FROM dict CROSS JOIN (SELECT unnest(range(0, $CmsK)) AS j) ks"""
  }

  /** The bpe3 oracle's six chained train rounds, generated so the SQL
    * can't drift from the loop above: dictK = dict(K-1) with round K's
    * winning pair collapsed to marker K. */
  private val bpe3OracleSql: String = {
    val markers = "ABCDEF"
    val rounds = markers.indices.map { r =>
      s"""top$r AS (SELECT pair AS m FROM (${pairSql(s"SELECT * FROM dict$r", "enc")})
            ORDER BY weight DESC, pair ASC LIMIT 1),
         dict${r + 1} AS (SELECT w, wc,
            replace(enc, (SELECT m FROM top$r), '${markers(r)}') AS enc
            FROM dict$r)"""
    }.mkString(",\n")
    s"""WITH dict0 AS (SELECT w, wc, w AS enc FROM ($dictSql)),
       $rounds,
       toks AS (SELECT doc_id,
           unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
         FROM documents)
       SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_words,
              CAST(sum(length(t.w)) AS BIGINT) AS n_chars,
              CAST(sum(length(d.enc)) AS BIGINT) AS n_symbols
       FROM toks t JOIN dict${markers.length} d USING (w)
       GROUP BY t.doc_id"""
  }

  override val oracles: Map[String, String] = Map(
    "bpe3_encode" -> bpe3OracleSql,
    "cms1_heavy_hitters" ->
      s"""WITH dict AS ($dictSql),
            entries AS ($cmsEntriesSql),
            sketch AS (SELECT j, b, CAST(sum(wc) AS BIGINT) AS cnt
                       FROM entries GROUP BY j, b),
            top AS (SELECT w FROM dict ORDER BY wc DESC, w ASC LIMIT 20)
          SELECT e.w AS tok,
            CAST(max(e.wc) AS BIGINT) AS true_cnt,
            CAST(min(s.cnt) AS BIGINT) AS est_cnt,
            CAST(min(s.cnt) - max(e.wc) AS BIGINT) AS over_cnt
          FROM entries e JOIN top USING (w)
          JOIN sketch s ON e.j = s.j AND e.b = s.b
          GROUP BY e.w""",
    "bpe1_pair_counts" ->
      s"""SELECT pair, weight FROM (${pairSql(dictSql, "w")})
          ORDER BY weight DESC, pair ASC LIMIT 50""",
    "bpe2_second_merge" ->
      s"""WITH dict AS ($dictSql),
            top1 AS (SELECT pair AS merge1 FROM (${pairSql("SELECT * FROM dict", "w")})
                     ORDER BY weight DESC, pair ASC LIMIT 1),
            merged AS (SELECT wc, replace(w, (SELECT merge1 FROM top1), '#') AS w2
                       FROM dict)
          SELECT pair, weight FROM (${pairSql("SELECT * FROM merged", "w2")})
          ORDER BY weight DESC, pair ASC LIMIT 20""",
    "tx14_bigram_logprob" ->
      """WITH toks AS (
           SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok,
             unnest(range(0, len(regexp_split_to_array(trim(lower(text)), '\s+')))) AS pos
           FROM documents),
         stream AS (
           SELECT doc_id, pos, tok,
             lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
           FROM toks),
         bigrams AS (
           SELECT prev, tok, CAST(count(*) AS BIGINT) AS c2 FROM stream
           WHERE prev IS NOT NULL GROUP BY prev, tok),
         contexts AS (
           SELECT prev, CAST(sum(c2) AS BIGINT) AS c1 FROM bigrams GROUP BY prev),
         unigrams AS (
           SELECT tok, CAST(count(*) AS BIGINT) AS cu FROM stream GROUP BY tok),
         scalars AS (
           SELECT CAST(count(*) AS BIGINT) AS n_corpus,
                  CAST(count(DISTINCT tok) AS BIGINT) AS v_corpus FROM stream),
         m AS (
           SELECT s.doc_id,
             CAST(floor(-ln(CASE
               WHEN s.prev IS NULL
                 THEN (u.cu + 1.0) / (sc.n_corpus + sc.v_corpus + 1.0)
               ELSE (coalesce(b.c2, 0) + 1.0) /
                    (coalesce(x.c1, 0) + sc.v_corpus + 1.0)
             END) * 1000000) AS BIGINT) AS m
           FROM stream s
           LEFT JOIN bigrams b ON s.prev = b.prev AND s.tok = b.tok
           LEFT JOIN contexts x ON s.prev = x.prev
           LEFT JOIN unigrams u ON s.tok = u.tok
           CROSS JOIN scalars sc)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
           CAST(sum(m) AS BIGINT) AS nll_micro,
           CAST(sum(m) AS BIGINT) // count(*) AS avg_nll_micro
         FROM m GROUP BY doc_id""",
  )
}
