package graft.heroql

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Builtin scalar functions of the HeroQL expression grammar.
  *
  * The reference's language design has no scalar-function surface of
  * its own (computation is expressed through moded `func` clauses,
  * `Kernel/Drafts/draft:75-89`) — builtins are this engine's extension
  * point for operations a training-data pipeline needs at the LANGUAGE
  * level, starting with the ~60-bit document fingerprint that keys the
  * 100 TB dedup shape (pipe2/st5b). Names here are reserved in
  * expression position: the parser resolves `name(args)` to a scalar
  * call only for these names, so relation atoms keep their meaning in
  * boolean contexts.
  *
  * All builtins compile to composed Catalyst expressions (never Scala
  * UDFs), so a HeroQL query using them stays inside whole-stage codegen
  * and the optimizer sees through them like any other column.
  */
object Builtins {

  /** Reserved builtin names — checked by the parser before an
    * `ident(`-shaped token run is read as a relation atom. */
  val scalar: Set[String] =
    Set("fingerprint", "token_count", "char_count", "simhash", "redact",
      "md5hex", "substr")

  /** Plan a builtin call over already-planned argument columns. */
  def plan(fn: String, args: Seq[Column]): Column = (fn, args) match {
    // the pipe2/st5b dedup key: two-prime CRT polynomial hash — see
    // graft.operators.TextFns.fingerprint for the collision budget
    case ("fingerprint", Seq(text)) => graft.operators.TextFns.fingerprintOf(text)
    // whitespace token count (tx1's ws_tokens), as BIGINT
    case ("token_count", Seq(text)) =>
      size(split(trim(text), "\\s+")).cast("long")
    case ("char_count", Seq(text)) => length(text).cast("long")
    // dd4's 31-bit near-dup signature (native token-hash + sign-fold)
    case ("simhash", Seq(text)) => graft.operators.TextFns.simhashOf(text)
    // tx7's three-stage PII scrub (email → IP → phone)
    case ("redact", Seq(text)) => graft.operators.TextFns.redactPii(text)
    // deterministic-split keys: the lowercase-hex md5 digest (byte-
    // identical in Spark and DuckDB) plus 1-based substring — together
    // they express reproducible train/val hash splits (samp5's shape)
    // and content-ranked quotas from query text, no RNG state
    case ("md5hex", Seq(x)) => md5(x)
    case ("substr", Seq(str, pos, len)) => str.substr(pos, len)
    case (name, as) => throw Analyzer.AnalysisError(
      s"builtin $name does not take ${as.length} argument(s)")
  }
}
