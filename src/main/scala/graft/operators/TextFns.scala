package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text / vector primitives for the training-data pipeline operators.
  *
  * All of these are *composed Catalyst expressions* (higher-order
  * functions, regexes, arithmetic) — never Scala UDFs — so they stay
  * inside whole-stage codegen and remain visible to the optimizer
  * (pushdown/pruning still work around them). Each formula is written to
  * be exactly mirrorable in the DuckDB oracle dialect (see the paired
  * SQL in graft.queries.*): same operation order, same integer modulus,
  * so results hash-match bit-for-bit.
  */
object TextFns {

  /** Distinct character n-gram shingles of `textCol`.
    * Documents shorter than n shingle to the empty array (mirrors
    * DuckDB `range(1, greatest(len-n+1,0)+1)` semantics). */
  def shinglesSql(textCol: String, n: Int): String =
    s"""CASE WHEN length($textCol) >= $n
        THEN array_distinct(transform(sequence(1, length($textCol) - ${n - 1}),
               i -> substr($textCol, i, $n)))
        ELSE array() END"""

  def shingles(textCol: String, n: Int): Column = expr(shinglesSql(textCol, n))

  /** Whitespace tokens of trimmed text. */
  def tokens(textCol: String): Column =
    expr(s"split(trim($textCol), '\\\\s+')")

  /** Deterministic polynomial hash of a string expression, seeded —
    * `fold (acc, c) -> (acc*31 + codepoint(c)) mod m` over characters.
    * Same fold is expressible in DuckDB via `list_reduce`, which is the
    * whole reason we don't use xxhash64 here (oracle parity). */
  def polyHashSql(strSql: String, seed: Long, mod: Long): String =
    s"""aggregate(transform(sequence(1, length($strSql)),
          i -> CAST(ascii(substr($strSql, i, 1)) AS BIGINT)),
        CAST($seed AS BIGINT), (acc, x) -> (acc * 31 + x) % $mod)"""

  /** Rolling-hash document fingerprint (`doc fingerprinting` op).
    *
    * Two independent-modulus polynomial hashes combined by CRT:
    * `h1 * p2 + h2` with p1 = 1000000007, p2 = 998244353 uniquely
    * encodes the text's polynomial value mod p1·p2 ≈ 9.98e17 — a
    * ~60-bit key space that fits signed BIGINT (max ≈ 9.99e17 <
    * 2^63-1). A single 31-bit modulus is NOT enough for a dedup key:
    * at 10^9 documents the birthday load factor on 10^9 slots is ~1
    * and distinct documents silently collapse. At ~60 bits the
    * expected number of colliding PAIRS across 10^9 documents is
    * n²/(2·p1·p2) ≈ 0.5 — fingerprint-keyed dedup loses at most a
    * handful of documents at the full advertised scale, and exact
    * parity holds against the same two-fold expression in DuckDB. */
  def fingerprint(textCol: String): Column = fingerprintOf(col(textCol))

  /** [[fingerprint]] over an arbitrary Column (the HeroQL builtin plans
    * through this form) — the NATIVE expression
    * ([[graft.functions.VectorFns.Fingerprint64]]): both folds in one
    * codepoint walk. The composed-HOF folds evaluate one interpreted
    * lambda per character per modulus — a 1 KB document costs ~2000
    * closure dispatches per row, which dominated the census bench once
    * the key widened to two folds. */
  def fingerprintOf(text: Column): Column = {
    graft.functions.VectorFns.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("graft_fingerprint64", text)
  }

  /** The composed higher-order-function form of [[fingerprintOf]] —
    * kept as the readable reference implementation (bit-identical; the
    * parity spec pins the native expression to it). */
  def fingerprintHof(text: Column): Column = {
    def poly(mod: Long): Column = aggregate(
      transform(sequence(lit(1), length(text)),
        i => ascii(text.substr(i, lit(1))).cast("long")),
      lit(0L),
      (acc, x) => (acc * lit(31L) + x) % lit(mod))
    poly(1000000007L) * lit(998244353L) + poly(998244353L)
  }

  /** The DuckDB-dialect mirror of [[fingerprint]] — kept adjacent so
    * the two folds can never drift apart. Used verbatim by the tx4 /
    * pipe2 / st5b oracles. */
  def fingerprintDuckSql(textExpr: String): String = {
    def fold(mod: Long): String =
      s"""list_reduce(
           list_concat([CAST(0 AS BIGINT)],
             [CAST(unicode(substr($textExpr, x, 1)) AS BIGINT) for x in range(1, length($textExpr) + 1)]),
           (acc, x) -> (acc * 31 + x) % $mod)"""
    s"CAST(${fold(1000000007L)} * 998244353 + ${fold(998244353L)} AS BIGINT)"
  }

  /** Per-token polynomial hashes of whitespace tokens (precompute this
    * once per row — the bit loop in [[simhashOfHashes]] folds over it 31
    * times, and recomputing string hashes per bit is a 31× slowdown). */
  def tokenHashes(textCol: String): Column = expr(
    s"""transform(split(trim($textCol), '\\\\s+'),
          t -> ${polyHashSql("t", 7L, 2147483647L)})""")

  /** 31-bit SimHash from a precomputed token-hash array column:
    * sign-of-sum per bit position. */
  def simhashOfHashes(hsCol: String): Column = expr(
    s"""aggregate(
          transform(sequence(0, 30), b ->
            CASE WHEN aggregate(
                   transform($hsCol,
                     h -> CASE WHEN h div shiftleft(CAST(1 AS BIGINT), b) % 2 = 1
                          THEN 1 ELSE -1 END),
                   0, (acc, x) -> acc + x) > 0
            THEN shiftleft(CAST(1 AS BIGINT), b) ELSE CAST(0 AS BIGINT) END),
          CAST(0 AS BIGINT), (acc, x) -> acc + x)""")

  /** Count of regex matches (group 0), as BIGINT for oracle parity. */
  def countMatches(colSql: String, pattern: String): Column =
    expr(s"CAST(size(regexp_extract_all($colSql, '$pattern', 0)) AS BIGINT)")

  // PII patterns — shared syntax subset of java.util.regex (Spark) and
  // RE2 (DuckDB): character classes, bounded repeats, no lookaround.
  // Raw (non-SQL-escaped) forms for the functions API / lit().
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipRe = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"
  val phoneRe = "\\+1-555-\\d{4}"

  /** Three-stage PII redaction chain (email → IP → phone) — the tx7 /
    * pipe3 scrub and the `redact` HeroQL builtin. Map-only composed
    * expression; order matters and is mirrored by [[redactPiiDuckSql]]. */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(text,
      emailRe, "<EMAIL>"), ipRe, "<IP>"), phoneRe, "<PHONE>")

  /** DuckDB mirror of [[redactPii]] (explicit 'g' flag — Spark replaces
    * all matches by default). */
  def redactPiiDuckSql(e: String): String =
    s"""regexp_replace(regexp_replace(regexp_replace($e,
        '$emailRe', '<EMAIL>', 'g'), '$ipRe', '<IP>', 'g'),
        '$phoneRe', '<PHONE>', 'g')"""

  /** 31-bit SimHash of whitespace tokens via the native expressions
    * (token polyhash + sign-fold — dd4's shape), registered on the
    * active session like [[fingerprintOf]]. */
  def simhashOf(text: Column): Column = {
    graft.functions.VectorFns.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("graft_simhash31",
      call_function("graft_token_polyhash", split(trim(text), "\\s+")))
  }

  /** DuckDB mirror of the per-token polynomial hash (seed 7,
    * mod 2^31-1) over a token expression `tk` — kept adjacent to
    * [[tokenHashes]] so the folds can't drift. */
  def tokenHashDuckSql(tk: String): String =
    s"""list_reduce(
         list_concat([CAST(7 AS BIGINT)],
           [CAST(unicode(substr($tk, x, 1)) AS BIGINT) for x in range(1, length($tk) + 1)]),
         (acc, x) -> (acc * 31 + x) % 2147483647)"""

  /** DuckDB mirror of [[simhashOfHashes]] over a BIGINT-list expression
    * `hs`: sign-of-sum per bit position, 31 bits. */
  def simhashOfHashesDuckSql(hs: String): String =
    s"""CAST(list_sum([CASE WHEN list_sum(
           [CASE WHEN (h // (1 << b)) % 2 = 1 THEN 1 ELSE -1 END for h in $hs]) > 0
         THEN CAST(1 AS BIGINT) << b ELSE CAST(0 AS BIGINT) END for b in range(31)]) AS BIGINT)"""

  /** DuckDB mirror of [[simhashOf]] over a text expression: token
    * hashes then the 31-bit sign-fold. */
  def simhashDuckSql(textExpr: String): String =
    simhashOfHashesDuckSql(
      s"[${tokenHashDuckSql("tk")} for tk in regexp_split_to_array(trim($textExpr), '\\s+')]")

  /** Dot product of two float-array columns, accumulated in double in
    * element order. */
  def dotSql(x: String, y: String): String =
    s"""aggregate(zip_with($x, $y,
          (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)),
        CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"""

  /** Cosine similarity between two float-array columns (matches DuckDB
    * list_cosine_similarity within 1e-6). Hot paths should precompute
    * per-row norms and use [[dotSql]] once per pair instead. */
  def cosineSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  def cosine(a: String, b: String): Column = expr(cosineSql(a, b))

  /** Exact Jaccard similarity of two (distinct-element) array columns:
    * |a ∩ b| / |a ∪ b| via inclusion-exclusion — array_intersect is
    * hash-based, no sort. Prefer [[jaccardFromIntersect]] in hot paths
    * so the intersect runs once per row. */
  def jaccard(a: String, b: String): Column = expr(
    s"""CAST(size(array_intersect($a, $b)) AS DOUBLE) /
        CAST(size($a) + size($b) - size(array_intersect($a, $b)) AS DOUBLE)""")

  /** Jaccard from a precomputed `|a ∩ b|` count plus the two set sizes. */
  def jaccardFromIntersect(interCol: String, sizeA: String, sizeB: String): Column =
    expr(s"CAST($interCol AS DOUBLE) / CAST($sizeA + $sizeB - $interCol AS DOUBLE)")

  /** Merge per-document gram-hit positions into maximal spans (the
    * islands shape): positions at most `gramLen` apart coalesce — a
    * hit at pos p covers tokens [p, p+gramLen-1], so the NEXT
    * overlapping-or-adjacent hit starts within gramLen — via lag →
    * new-span flag → running-sum span id; each span covers
    * [min pos, max pos + gramLen - 1]. ONE definition shared by dd10
    * (duplicate spans) and dc2 (contamination spans), mirrored by
    * [[mergeSpansDuckSql]], so the merge rule can't drift between the
    * operator family and its oracles. Input needs (`idCol`, `pos`);
    * output: (`idCol`, span_id, p0, p1, n_grams). The window is
    * per-document (bounded by document length), never corpus-wide. */
  def mergeSpans(hits: org.apache.spark.sql.DataFrame, idCol: String,
      gramLen: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(idCol).orderBy("pos")
    hits
      .withColumn("new_span",
        when(col("pos") - lag("pos", 1).over(w) <= gramLen, 0L).otherwise(1L))
      .withColumn("span_id", sum("new_span").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(idCol, "span_id")
      .agg(min("pos").as("p0"), (max("pos") + gramLen - 1).as("p1"),
        count(lit(1)).as("n_grams"))
  }

  /** DuckDB mirror of [[mergeSpans]]: CTE fragment `flg, sp, spans`
    * over an existing `hits(idCol, pos)` relation — splice after it
    * with a leading comma. */
  def mergeSpansDuckSql(hitsRel: String, idCol: String, gramLen: Int): String =
    s"""flg AS (
         SELECT $idCol, pos,
           CASE WHEN pos - lag(pos) OVER (PARTITION BY $idCol ORDER BY pos) <= $gramLen
                THEN 0 ELSE 1 END AS new_span
         FROM $hitsRel),
       sp AS (
         SELECT $idCol, pos,
           sum(new_span) OVER (PARTITION BY $idCol ORDER BY pos
             ROWS UNBOUNDED PRECEDING) AS span_id
         FROM flg),
       spans AS (
         SELECT $idCol, span_id, min(pos) AS p0, max(pos) + ${gramLen - 1} AS p1,
                count(*) AS n_grams
         FROM sp GROUP BY $idCol, span_id)"""
}
