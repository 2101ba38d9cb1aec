package graft

import org.apache.spark.sql.functions._
import graft.heroql.Parser

/** Short-document guards for the gram-based text operators (round-8
  * ADVICE): the fixture corpus is 10-99 tokens, but real corpora are
  * full of 1-7-token documents, where an unguarded
  * `sequence(1, size - k)` DESCENDS and `slice`/`element_at` throw at
  * runtime. Also pins the parser's reserved-builtin-name diagnostic. */
class ShortDocGuardSpec extends SparkSpec {

  /** Stage a scratch `documents.parquet` with deliberately short docs
    * (the driver fixture can't cover them). */
  private lazy val shortDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-shortdoc-").toString
    Seq(
      (1L, "single", "en", 6L),
      (2L, "two tokens", "en", 10L),
      (3L, "three short tokens here no", "en", 26L),
      (7L, "alpha beta gamma delta epsilon zeta eta theta iota", "en", 50L),
      (8L, "alpha beta gamma delta epsilon zeta eta theta kappa", "en", 51L),
      (14L, "seven tokens exactly one short of gram", "en", 38L),
    ).toDF("doc_id", "text", "lang", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("tx5 handles 1-token documents: no throw, ratio defined as 0.0") {
    val out = graft.queries.TextAnalysis
      .queries("tx5_repetition_filter")(spark, shortDir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val one = out(1L)
    assert(one.getAs[Long]("n_tok") == 1L)
    assert(one.getAs[Long]("n_distinct_2gram") == 0L)
    assert(one.getAs[Double]("gram2_rep_ratio") == 0.0)
    assert(one.getAs[Boolean]("keep"))
    // a 2-token doc has exactly one 2-gram, ratio 0
    assert(out(2L).getAs[Long]("n_distinct_2gram") == 1L)
    assert(out(2L).getAs[Double]("gram2_rep_ratio") == 0.0)
  }

  test("dc1 handles sub-8-token documents: no grams, no throw") {
    val out = graft.queries.TrainingSetQueries
      .queries("dc1_decontamination")(spark, shortDir)
      .collect().map(r => r.getAs[Long]("train_id") -> r.getAs[Long]("n_shared_grams"))
      .toMap
    // eval slice = doc 7 and doc 14 (doc_id % 7 = 0). Doc 14 is 7
    // tokens — no grams. Docs 7 and 8 differ only in their 9th token,
    // so they share exactly one 8-gram ("alpha .. theta") and train
    // doc 8 is the single flagged document; the 1/2/5-token train docs
    // contribute no grams and nothing throws.
    assert(out == Map(8L -> 1L))
  }

  test("dc2 handles sub-8-token documents: no grams, no throw") {
    // same corpus: train doc 8 shares its 8-gram with eval doc 7's
    // first-25-token excerpt; everything shorter contributes nothing
    val out = graft.queries.TrainingSetQueries
      .queries("dc2_contamination_spans")(spark, shortDir)
      .collect().map(r => r.getAs[Long]("train_id") ->
        (r.getAs[Long]("n_hit_grams"), r.getAs[Long]("n_spans")))
      .toMap
    assert(out == Map(8L -> ((1L, 1L))))
  }

  test("dd10 handles sub-16-token documents: no grams, no throw, empty result") {
    // every scratch doc is under the 16-token gram width — the guarded
    // sequence yields no positions anywhere and the result is empty
    // (an unguarded form would descend and throw on the 1-token doc)
    val out = graft.queries.Dedup
      .queries("dd10_duplicate_spans")(spark, shortDir).collect()
    assert(out.isEmpty)
  }

  test("tx7 and pipe3 handle short documents: redaction chain total on any text") {
    val tx = graft.queries.TextAnalysis
      .queries("tx7_pii_redaction")(spark, shortDir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 1 (% 7 = 1) gets a planted IP, doc 2 a phone, doc 7/14 emails
    assert(tx(1L).getAs[Long]("n_ips") == 1L)
    assert(tx(2L).getAs[Long]("n_phones") == 1L)
    assert(tx(7L).getAs[Long]("n_emails") == 1L)
    val pipe = graft.queries.PipelineQueries
      .queries("pipe3_redacted_dedup")(spark, shortDir).collect()
    assert(pipe.nonEmpty)
  }

  test("declaring a builtin scalar name is rejected with a clear error") {
    val err = intercept[Parser.ParseError] {
      Parser.parse("data fingerprint(id: int64, text: string).")
    }
    assert(err.msg.contains("reserved builtin"))
    val err2 = intercept[Parser.ParseError] {
      Parser.parse(
        """data Docs(id: int64).
          |func token_count(in a, out b);
          |""".stripMargin)
    }
    assert(err2.msg.contains("reserved builtin"))
    val err3 = intercept[Parser.ParseError] {
      Parser.parse(
        """data Docs(id: int64).
          |query char_count(id: int64) :- Docs(id).
          |""".stripMargin)
    }
    assert(err3.msg.contains("reserved builtin"))
  }
}
