package graft

import org.apache.spark.sql.functions._
import graft.operators.TextFns

/** Pins the fingerprint to DuckDB-computed golden values on edge-case
  * strings the fixture corpus can't cover (empty, supplementary-plane):
  * the cross-engine contract is per-CODEPOINT folding, and these values
  * came from the DuckDB mirror expression run out-of-band. */
class FpEdgeCheck extends SparkSpec {
  test("fingerprint matches DuckDB golden values on edge-case strings") {
    import spark.implicits._
    val golden = Map(
      "" -> 0L,
      "a" -> 96829702338L,
      "日本語テキスト" -> 841418497024378392L,
      "mixed 日本 text" -> 207269325175385163L,
      "emoji 😀 pair" -> 163956695839649769L,
      "  spaces  " -> 637693361944003908L)
    val got = golden.keys.toSeq.toDF("text")
      .select(col("text"), TextFns.fingerprint("text").as("fp"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    golden.foreach { case (t, fp) =>
      assert(got(t) == fp, s"fingerprint('$t') = ${got(t)}, DuckDB says $fp")
    }
  }
}
