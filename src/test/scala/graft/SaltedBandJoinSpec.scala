package graft

import org.apache.spark.sql.functions._
import graft.operators.MinHashLSH

/** The skew escape hatch for dd3's banded candidate self-join
  * (`spark.graft.dedup.bandSaltBuckets`): a viral near-dup cluster —
  * one hot (band, sig) carrying every replica — must produce
  * byte-identical verified pairs through the salted path, with the
  * collision group genuinely spread across salt slots. */
class SaltedBandJoinSpec extends SparkSpec {

  /** 40 replicas of one text (a single hot band signature across every
    * band) + distinct filler docs. Long texts so 5-gram shingle sets
    * are non-trivial. */
  private def corpus = {
    val hot = spark.range(40).select(
      (col("id") + 500L).as("doc_id"),
      lit("the same viral boilerplate paragraph repeated everywhere online").as("text"))
    val cold = spark.range(30).select(
      col("id").as("doc_id"),
      concat(lit("a unique document number "), col("id"),
        lit(" with its own distinct words and phrasing")).as("text"))
    hot.unionByName(cold)
  }

  private def pairs() = MinHashLSH.nearDuplicates(
    corpus, "doc_id", "text",
    shingleLen = 5, bands = 7, rowsPerBand = 3, threshold = 0.5)
    .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def estPairs() = MinHashLSH.nearDuplicatesEstimated(
    corpus, "doc_id", "text",
    shingleLen = 5, bands = 7, rowsPerBand = 3, threshold = 0.5)
    .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("salted band join yields byte-identical pairs on a 40x hot signature") {
    val plain = pairs()
    val plainEst = estPairs()
    // every replica pair must be found regardless of path
    assert(plain.size >= 40 * 39 / 2, s"expected all replica pairs, got ${plain.size}")
    spark.conf.set(MinHashLSH.BandSaltConf, "8")
    try {
      assert(pairs() == plain,
        "salted candidate generation diverges from the unsalted result")
      // the estimator variant routes through the same salted join
      assert(estPairs() == plainEst,
        "salted estimator-verify candidates diverge from the unsalted result")
    } finally spark.conf.unset(MinHashLSH.BandSaltConf)
  }

  test("the salt reaches the join key and is off by default") {
    // run past the gate: the gated path materializes eagerly behind a
    // checkpoint (r21 probe verify), which hides the band join from the
    // returned plan — the shuffle path keeps it inspectable, and the
    // salted self-join is the same code either way
    spark.conf.set(graft.operators.SizeGate.MaxRowsConf, "0")
    def plan(): String = MinHashLSH.nearDuplicates(
      corpus, "doc_id", "text", 5, 7, 3, 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan().contains("__salt"), "band join salted without the conf")
    spark.conf.set(MinHashLSH.BandSaltConf, "8")
    try {
      val p = plan()
      assert(p.contains("__salt"), s"salted plan has no __salt key:\n$p")
      // the hot group's left side really occupies multiple salt slots
      val spread = corpus.filter(col("doc_id") >= 500L)
        .select(pmod(xxhash64(col("doc_id")), lit(8L)).as("s"))
        .distinct().count()
      assert(spread >= 4, s"hot cluster occupies only $spread of 8 salt slots")
    } finally {
      spark.conf.unset(MinHashLSH.BandSaltConf)
      spark.conf.unset(graft.operators.SizeGate.MaxRowsConf)
    }
  }
}
