package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** The composed end-to-end training-data preparation pipeline — the
  * stages every LLM data pipeline runs, chained from this engine's own
  * operators (each also verified standalone: tx2, dd1, a2):
  *
  *   1. quality-score every document (map-only —
  *      [[TextAnalysis.qualityScored]])
  *   2. keep documents above the quality bar (a filter Catalyst pushes
  *      below everything that follows)
  *   3. exact-dedup the survivors (keeper = min doc_id per text — ONE
  *      shuffle, on the high-cardinality text key)
  *   4. per-language corpus stats over the kept set (second shuffle, on
  *      the 5-value lang key — partial aggregation makes it map-side)
  *
  * Scale: stages 1-2 add zero exchanges; the whole pipeline is two
  * shuffles at any input size. At 100 TB the dedup key would be tx4's
  * 8-byte fingerprint instead of the raw text (same keeper semantics,
  * ~60 bytes → 8 through the exchange).
  */
object PipelineQueries extends QueryPack {

  /** Keeper aggregation per dedup key — min doc_id wins, its lang /
    * n_tok / quality ride along via min_by.
    *
    * Spark's partial (map-side) aggregation already collapses a hot key
    * to one partial row per input partition, so ordinary skew never
    * reaches a reducer. The residual case at 100 TB is a key so hot
    * (viral boilerplate text) that even the per-mapper partial rows
    * concentrate on one reducer while the map-side hash table is
    * thrashed by surrounding high-cardinality keys. For that corpus set
    * `spark.graft.dedup.saltBuckets = n`: the keeper agg becomes
    * two-level — partial per (key, salt(doc_id) mod n), then final per
    * key — spreading the hot key across n reduce groups. Deterministic
    * salt (hash of doc_id, not rand()) keeps task retries idempotent.
    * Off by default: the extra exchange only pays for itself on a
    * genuinely pathological corpus (SaltedAggSpec proves parity and
    * the n-way spread). */
  private[graft] def keeperAgg(s: SparkSession, kept: DataFrame, keyCol: String): DataFrame = {
    def aggs = Seq(
      min(col("doc_id")).as("doc_id"),
      expr("min_by(lang, doc_id)").as("lang"),
      expr("min_by(n_tok, doc_id)").as("n_tok"),
      expr("min_by(quality, doc_id)").as("quality"))
    val n = s.conf.getOption("spark.graft.dedup.saltBuckets").map(_.toInt).getOrElse(0)
    if (n <= 0) kept.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
    else kept
      .withColumn("__salt", pmod(xxhash64(col("doc_id")), lit(n)))
      .groupBy(col(keyCol), col("__salt")).agg(aggs.head, aggs.tail: _*)
      .groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }

  private def pipe1(s: SparkSession, d: String): DataFrame = {
    val kept = TextAnalysis.qualityScored(t(s, d, "documents"))
      .filter(col("quality") >= 0.54)
    keeperAgg(s, kept, "text").groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      sum("n_tok").as("sum_tokens"),
      round(avg("quality"), 6).as("avg_quality"))
  }

  /** pipe2 — pipe1 with the dedup stage keyed on tx4's 8-byte rolling
    * fingerprint instead of the raw text: the 100 TB shape (the
    * keeper exchange carries one long per row instead of ~KB of text —
    * the fingerprint is computed map-side, so the swap costs zero extra
    * stages). Same two-shuffle plan; PlanAuditSpec asserts the dedup
    * exchange partitions on `fp`. */
  private def pipe2(s: SparkSession, d: String): DataFrame = {
    val kept = TextAnalysis.qualityScored(t(s, d, "documents"))
      .filter(col("quality") >= 0.54)
      .withColumn("fp", graft.operators.TextFns.fingerprint("text"))
    keeperAgg(s, kept, "fp").groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      sum("n_tok").as("sum_tokens"),
      round(avg("quality"), 6).as("avg_quality"))
  }

  /** pipe3 — redaction-then-dedup (the normalize-before-dedup rule
    * every published pipeline applies: near-identical documents that
    * differ only in embedded contact strings — mirrored pages with
    * different webmaster emails — are NOT duplicates under raw-text
    * dedup, but collapse once PII is scrubbed; dedup therefore runs on
    * the REDACTED text's fingerprint). The corpus is documents plus a
    * dd6-style re-crawl of the doc_id % 5 = 0 slice under fresh ids;
    * the id shift is ≡ 0 (mod 7), so each copy plants the SAME PII
    * class as its original with DIFFERENT values — the pairs that
    * collapse only because redaction normalized them, the case this
    * pipeline exists for. Chain: plant+redact PII (tx7's map-only
    * stage) → fingerprint the redacted text (map) → keeper per fp
    * with copy counts (one 8-byte-keyed shuffle) → per-language dedup
    * yield (second shuffle, 5-value key, partial-agg). Same
    * two-shuffle plan as pipe2 at any input size. */
  private def pipe3(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents").select("doc_id", "lang", "n_chars", "text")
    val recrawl = docs.filter(col("doc_id") % 5 === 0)
      .withColumn("doc_id", col("doc_id") + 7000000L)
    val red = TextAnalysis.redacted(docs.unionAll(recrawl))
      .withColumn("fp", graft.operators.TextFns.fingerprintOf(col("red")))
    red.groupBy("fp")
      .agg(min("doc_id").as("doc_id"),
        expr("min_by(lang, doc_id)").as("lang"),
        expr("min_by(n_chars, doc_id)").as("n_chars"),
        count(lit(1)).as("n_copies"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_keepers"),
        sum(col("n_copies") - 1).as("n_removed"),
        sum("n_chars").as("sum_chars"))
  }

  /** pipe4 — LAYERED dedup, the production shape under heavy
    * duplication: exact dedup FIRST (one exchange on the text key)
    * collapses the duplication factor, near-dup pair work runs on the
    * REPRESENTATIVES only, connected components resolve near-dup
    * clusters, and every document maps through its representative to
    * the final keeper. Motivated by measurement: on a 10×-replicated
    * warehouse the pair-listing stage emits ~100× the pairs (every
    * replica pairs with every replica — output-bound but wasteful),
    * while this layering's pair stage runs on the SAME ~n_distinct
    * representatives regardless of duplication factor. The pair
    * source here is the exact-Jaccard join so the DuckDB oracle can
    * state it; at corpus scale the same layer is dd3's banded LSH
    * (identical downstream contract: pairs → CC → keeper). */
  private def pipe4(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFns.register(s)
    val docs = t(s, d, "documents").select("doc_id", "text")
    // layer 1: exact — representative = min doc_id per text
    val reps = docs.groupBy("text").agg(min("doc_id").as("rep_id"))
    val docRep = docs.join(reps, "text").select("doc_id", "rep_id")
    // layer 2: exact-Jaccard near-dup pairs among representatives only
    val sh = reps.select(col("rep_id"), sort_array(
      expr(s"transform(${graft.operators.TextFns.shinglesSql("text", 5)}, x -> xxhash64(x))"))
      .as("s"))
    val a = sh.repartition(s.sparkContext.defaultParallelism)
      .select(col("rep_id").as("a_id"), col("s").as("sa"))
    val b = sh.select(col("rep_id").as("b_id"), col("s").as("sb"))
    val pairs = a.join(broadcast(b), col("a_id") < col("b_id"))
      .withColumn("inter", expr("graft_sorted_intersect_long(sa, sb)"))
      .withColumn("j", graft.operators.TextFns.jaccardFromIntersect(
        "inter", "size(sa)", "size(sb)"))
      .filter(col("j") >= 0.25)
      .select(col("a_id").as("src"), col("b_id").as("dst"))
    // layer 3: connected components over near-dup edges → keeper per rep
    val cc = graft.operators.GraphOps.connectedComponentsDF(s, pairs)
    val repKeeper = reps.select("rep_id")
      .join(cc, col("rep_id") === col("node"), "left")
      .select(col("rep_id"),
        coalesce(col("component"), col("rep_id")).as("keeper_id"))
    // layer 4: every doc maps through its representative; sizes via
    // partial-aggregated groupBy, not a window (dd7's viral-key note)
    val labeled = docRep.join(repKeeper, "rep_id").select("doc_id", "keeper_id")
    val sizes = labeled.groupBy("keeper_id").agg(count(lit(1)).as("cluster_size"))
    labeled.join(sizes, "keeper_id").select("doc_id", "keeper_id", "cluster_size")
  }

  /** pipe5 — the RefinedWeb-shaped curation chain composed from this
    * round's operators, each also verified standalone: corpus-level
    * LINE dedup (dd11's boilerplate strike-out) → minimum-length
    * quality bar on the CLEANED text → per-source quota (samp6's
    * md5-rank cap, ranked on the cleaned text so boilerplate can't
    * influence selection) → deterministic train/val split (samp5's
    * rule, again on cleaned text so exact duplicates land in one
    * split). Exchange budget: dd11's two (fp count + doc reassembly)
    * + the quota's one WindowGroupLimit'd exchange — the length filter
    * and split are free. The oracle restates the whole chain as
    * nested CTEs. */
  private def pipe5(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = t(s, d, "documents")
      .withColumn("toks", expr("split(trim(text), '\\\\s+')"))
      .select(col("doc_id"), col("source"), posexplode(expr(
        """transform(sequence(1, CAST((size(toks) + 9) div 10 AS INT)),
             i -> array_join(slice(toks, (i - 1) * 10 + 1, 10), ' '))""")))
      .select(col("doc_id"), col("source"), (col("pos") + 1).as("pos"),
        col("col").as("line"))
      .withColumn("fp", xxhash64(col("line")))
    val boiler = lines.select("fp", "doc_id").distinct()
      .groupBy("fp").agg(count(lit(1)).as("nd")).filter(col("nd") >= 2)
      .select(col("fp"), lit(1).as("is_dup"))
    val cleaned = lines.join(boiler, Seq("fp"), "left")
      .groupBy("doc_id", "source")
      .agg(concat_ws(" ", expr(
        """transform(
             array_sort(collect_list(CASE WHEN is_dup IS NULL
               THEN struct(pos, line) END)),
             x -> x.line)""")).as("clean_text"))
      .withColumn("n_tok", when(col("clean_text") === "", 0L)
        .otherwise(size(split(col("clean_text"), " ")).cast("long")))
      .filter(col("n_tok") >= 20L)
    cleaned
      .withColumn("h", md5(col("clean_text")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("source").orderBy("h", "doc_id")))
      .filter(col("rk") <= 10)
      .select(col("doc_id"), col("source"), col("n_tok"),
        when(substring(col("h"), 1, 2) >= "e6", "val")
          .otherwise("train").as("split"))
  }

  /** pipe6 — CHUNK-level curation, composing this round's operators
    * end-to-end: sliding-window chunking (tx18's 32/24 windows) →
    * corpus-wide exact chunk dedup (keep the first (doc, chunk)
    * occurrence per chunk md5 — boilerplate shared across documents
    * dies here, the chunk-granular form of dd1/dd11) → per-source
    * TOKEN budget over the survivors (samp8's greedy running-sum
    * prefix). Emits the surviving chunk rows. Shape at scale: chunking
    * map-only, dedup one md5-keyed partial-agg exchange + semi-join,
    * budget one source-keyed window — three shuffles total over
    * chunk-sized rows, never document text re-shipped (the md5 stands
    * in for the chunk body everywhere past stage 1). */
  private def pipe6(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val chunks = t(s, d, "documents")
      .select(col("doc_id"), col("source"),
        split(trim(col("text")), "\\s+").as("toks"))
      .withColumn("n", size(col("toks")))
      .withColumn("k", explode(sequence(lit(0),
        when(col("n") <= 32, lit(0))
          .otherwise(expr("(n - 9) DIV 24").cast("int")))))
      .select(col("doc_id"), col("source"), col("k").cast("long").as("chunk_id"),
        expr("size(slice(toks, k * 24 + 1, 32))").cast("long").as("n_tokens"),
        md5(expr("array_join(slice(toks, k * 24 + 1, 32), ' ')")).as("h"))
    val first = chunks.groupBy("h")
      .agg(min(struct(col("doc_id"), col("chunk_id"))).as("f"))
      .select(col("h").as("h2"), col("f.doc_id").as("fd"),
        col("f.chunk_id").as("fc"))
    val kept = chunks.join(first,
      col("h") === col("h2") && col("doc_id") === col("fd") &&
        col("chunk_id") === col("fc"))
    val w = Window.partitionBy("source").orderBy("h", "doc_id", "chunk_id")
    kept
      .withColumn("cum_tokens", sum("n_tokens").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum_tokens") <= 400L)
      .select(col("source"), col("doc_id"), col("chunk_id"),
        col("n_tokens"), col("cum_tokens"))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipe6_chunk_curation" -> (pipe6 _),
    "pipe5_curation_chain" -> (pipe5 _),
    "pipe1_training_pipeline" -> (pipe1 _),
    "pipe2_fingerprint_pipeline" -> (pipe2 _),
    "pipe3_redacted_dedup" -> (pipe3 _),
    "pipe4_layered_dedup" -> (pipe4 _),
  )

  override val oracles: Map[String, String] = Map(
    "pipe6_chunk_curation" ->
      """WITH tk AS (
           SELECT doc_id, source,
                  regexp_split_to_array(trim(text), '\s+') AS toks
           FROM documents),
         ch AS (
           SELECT doc_id, source, CAST(k AS BIGINT) AS chunk_id,
                  CAST(len(toks[k*24 + 1 : least(k*24 + 32, len(toks))])
                    AS BIGINT) AS n_tokens,
                  md5(array_to_string(
                    toks[k*24 + 1 : least(k*24 + 32, len(toks))], ' ')) AS h
           FROM (SELECT doc_id, source, toks,
                   unnest(range(0, CASE WHEN len(toks) <= 32 THEN 1
                     ELSE ((len(toks) - 9) // 24) + 1 END)) AS k
                 FROM tk)),
         first AS (
           SELECT h, min({'d': doc_id, 'c': chunk_id}) AS f FROM ch GROUP BY h),
         kept AS (
           SELECT c.* FROM ch c JOIN first f
             ON c.h = f.h AND c.doc_id = (f.f).d
                AND c.chunk_id = (f.f).c),
         cum AS (
           SELECT source, doc_id, chunk_id, n_tokens,
                  sum(n_tokens) OVER (PARTITION BY source
                    ORDER BY h, doc_id, chunk_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS cum_tokens
           FROM kept)
         SELECT source, doc_id, chunk_id, n_tokens,
                CAST(cum_tokens AS BIGINT) AS cum_tokens
         FROM cum WHERE cum_tokens <= 400""",
    // the chain restated: line dedup -> length bar -> md5 quota -> split
    "pipe5_curation_chain" ->
      """WITH tk AS (
           SELECT doc_id, source,
             regexp_split_to_array(trim(text), '\s+') AS toks
           FROM documents),
         ls AS (
           SELECT doc_id, source,
             [{'pos': CAST(i AS BIGINT),
               'line': array_to_string(list_slice(toks, (i-1)*10 + 1, i*10), ' ')}
              for i in range(1, CAST((len(toks) + 9) // 10 AS BIGINT) + 1)] AS l
           FROM tk),
         ln AS (SELECT doc_id, source, unnest(l, recursive := true) FROM ls),
         c AS (SELECT line, count(DISTINCT doc_id) AS nd FROM ln GROUP BY 1),
         cl AS (
           SELECT ln.doc_id, ln.source,
             coalesce(string_agg(ln.line, ' ' ORDER BY ln.pos)
               FILTER (c.nd = 1), '') AS clean_text
           FROM ln JOIN c USING (line)
           GROUP BY ln.doc_id, ln.source),
         qual AS (
           SELECT doc_id, source, clean_text,
             CASE WHEN clean_text = '' THEN 0
                  ELSE len(string_split(clean_text, ' ')) END AS n_tok
           FROM cl
           WHERE (CASE WHEN clean_text = '' THEN 0
                       ELSE len(string_split(clean_text, ' ')) END) >= 20),
         ranked AS (
           SELECT doc_id, source, n_tok, md5(clean_text) AS h,
             row_number() OVER (PARTITION BY source
               ORDER BY md5(clean_text), doc_id) AS rk
           FROM qual)
         SELECT doc_id, source, CAST(n_tok AS BIGINT) AS n_tok,
           CASE WHEN substring(h, 1, 2) >= 'e6' THEN 'val'
                ELSE 'train' END AS split
         FROM ranked WHERE rk <= 10""",
    // stage-for-stage mirror: exact reps, Jaccard pairs among reps,
    // recursive-CTE connected components, doc → rep → keeper
    "pipe4_layered_dedup" ->
      """WITH RECURSIVE reps AS (
           SELECT text, min(doc_id) AS rep_id FROM documents GROUP BY text),
         dr AS (
           SELECT d.doc_id, r.rep_id FROM documents d JOIN reps r USING (text)),
         sh AS (
           SELECT rep_id,
             list_distinct([substr(text, x, 5)
               for x in range(1, greatest(length(text) - 4, 0) + 1)]) AS s
           FROM reps),
         pairs AS (
           SELECT a.rep_id AS a_id, b.rep_id AS b_id
           FROM sh a JOIN sh b ON a.rep_id < b.rep_id
           WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                 CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) >= 0.25),
         edges AS (
           SELECT a_id AS u, b_id AS v FROM pairs
           UNION ALL SELECT b_id, a_id FROM pairs),
         reach(u, r) AS (
           SELECT rep_id, rep_id FROM reps
           UNION
           SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u),
         lab AS (SELECT u AS rep_id, min(r) AS keeper_id FROM reach GROUP BY u),
         dl AS (SELECT dr.doc_id, lab.keeper_id FROM dr JOIN lab USING (rep_id))
         SELECT doc_id, keeper_id,
                count(*) OVER (PARTITION BY keeper_id) AS cluster_size
         FROM dl""",
    // stage-for-stage mirror of the Spark pipeline: score, filter,
    // keep min-doc_id per text, aggregate per language
    "pipe1_training_pipeline" ->
      """WITH c AS (
           SELECT doc_id, lang, text,
             CAST(length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok,
             CAST(length(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS alpha,
             CAST(length(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS punct,
             CAST(length(regexp_extract_all(text, '[A-Z]')) AS BIGINT) AS n_upper,
             CAST(length(regexp_extract_all(lower(text), '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS BIGINT) AS stop
           FROM documents),
         q AS (
           SELECT doc_id, lang, text, n_tok,
             0.35 * least(CAST(stop AS DOUBLE) / greatest(n_tok, 1) * 3.0, 1.0)
               + 0.25 * (1.0 - least(CAST(punct AS DOUBLE) / greatest(length(text), 1) * 10.0, 1.0))
               + 0.25 * least(CAST(alpha AS DOUBLE) / greatest(n_tok, 1) / 8.0, 1.0)
               + 0.15 * (1.0 - CAST(n_upper AS DOUBLE) / greatest(alpha, 1)) AS quality
           FROM c),
         f AS (SELECT * FROM q WHERE quality >= 0.54),
         k AS (
           SELECT text, min(doc_id) AS doc_id,
                  min_by(lang, doc_id) AS lang,
                  min_by(n_tok, doc_id) AS n_tok,
                  min_by(quality, doc_id) AS quality
           FROM f GROUP BY text)
         SELECT lang, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
                round(avg(quality), 6) AS avg_quality
         FROM k GROUP BY lang""",
    // pipe2: identical chain, but the keeper stage groups on the tx4
    // rolling fingerprint (same expression as the tx4 oracle)
    "pipe2_fingerprint_pipeline" ->
      ("""WITH c AS (
           SELECT doc_id, lang, text,
             CAST(length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok,
             CAST(length(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS alpha,
             CAST(length(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS punct,
             CAST(length(regexp_extract_all(text, '[A-Z]')) AS BIGINT) AS n_upper,
             CAST(length(regexp_extract_all(lower(text), '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS BIGINT) AS stop
           FROM documents),
         q AS (
           SELECT doc_id, lang, text, n_tok,
             0.35 * least(CAST(stop AS DOUBLE) / greatest(n_tok, 1) * 3.0, 1.0)
               + 0.25 * (1.0 - least(CAST(punct AS DOUBLE) / greatest(length(text), 1) * 10.0, 1.0))
               + 0.25 * least(CAST(alpha AS DOUBLE) / greatest(n_tok, 1) / 8.0, 1.0)
               + 0.15 * (1.0 - CAST(n_upper AS DOUBLE) / greatest(alpha, 1)) AS quality
           FROM c),
         f AS (SELECT *,
             """ + graft.operators.TextFns.fingerprintDuckSql("text") + """ AS fp
           FROM q WHERE quality >= 0.54),
         k AS (
           SELECT fp, min(doc_id) AS doc_id,
                  min_by(lang, doc_id) AS lang,
                  min_by(n_tok, doc_id) AS n_tok,
                  min_by(quality, doc_id) AS quality
           FROM f GROUP BY fp)
         SELECT lang, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
                round(avg(quality), 6) AS avg_quality
         FROM k GROUP BY lang"""),
    // tx7's plant+redact chain, then pipe2's keeper shape on the
    // redacted text's fingerprint
    "pipe3_redacted_dedup" ->
      (s"""WITH u AS (
           SELECT doc_id, lang, n_chars, text FROM documents
           UNION ALL
           SELECT doc_id + 7000000, lang, n_chars, text FROM documents
           WHERE doc_id % 5 = 0),
         a AS (
           SELECT doc_id, lang, n_chars, ${TextAnalysis.augDuckSql} AS aug
           FROM u),
         r AS (SELECT doc_id, lang, n_chars,
                 ${TextAnalysis.redactDuckSql("aug")} AS red FROM a),
         f AS (SELECT doc_id, lang, n_chars, """
        + graft.operators.TextFns.fingerprintDuckSql("red") + """ AS fp FROM r),
         k AS (
           SELECT fp, min(doc_id) AS doc_id,
                  min_by(lang, doc_id) AS lang,
                  min_by(n_chars, doc_id) AS n_chars,
                  count(*) AS n_copies
           FROM f GROUP BY fp)
         SELECT lang, count(*) AS n_keepers,
           CAST(sum(n_copies - 1) AS BIGINT) AS n_removed,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM k GROUP BY lang"""),
  )
}
