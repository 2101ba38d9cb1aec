package graft

import org.apache.spark.sql.functions._
import graft.operators.{MinHashLSH, TextFns}

/** Pins the r20 native md5 shingle-hash expression
  * ([[graft.functions.VectorFns.ShingleHashesMd5Sorted]]) to the
  * composed-SQL chain it replaced — `sort_array(array_distinct(
  * transform(shingles(text, n), x -> md5Hash31Sql(x))))` — element for
  * element on real fixture text and on every edge shape (null, empty,
  * shorter-than-n, multi-byte UTF-8, duplicate windows). The composed
  * chain IS the DuckDB-oracle-expressible definition, so this parity is
  * what keeps dd3, the dd14 family, hq36 and hq38 hash-strict after
  * the swap. */
class Md5ShingleParitySpec extends SparkSpec {

  private def composed(textCol: String, n: Int) =
    sort_array(array_distinct(expr(
      s"transform(${TextFns.shinglesSql(textCol, n)}," +
        s" x -> ${MinHashLSH.md5Hash31Sql("x")})")))

  test("native md5 shingle hashes equal the composed SQL on fixture docs") {
    graft.functions.VectorFns.register(spark)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val both = docs
      .withColumn("nat", expr("graft_shingle_hashes_md5(text, 5)"))
      .withColumn("ref", composed("text", 5))
    assert(both.filter(not(col("nat") <=> col("ref"))).count() === 0)
    // non-degenerate: the fixture really produces shingles
    assert(both.filter(size(col("nat")) > 0).count() > 0)
  }

  test("edge shapes: null, empty, short, multi-byte, duplicates") {
    graft.functions.VectorFns.register(spark)
    import spark.implicits._
    val rows = Seq(
      (1L, null.asInstanceOf[String]), // null → empty array (CASE form)
      (2L, ""), // empty
      (3L, "abcd"), // shorter than n=5 → empty
      (4L, "abcde"), // exactly one window
      (5L, "aaaaaaaaaa"), // all windows identical → one hash
      (6L, "héllo wörld ünïcode"), // multi-byte: substr is codepoint-based
      (7L, "日本語のテキストです"), // 3-byte codepoints
      (8L, "mix 日本 ascii と emoji 😀 end")) // 4-byte surrogate pair
    val df = rows.toDF("id", "text")
      .withColumn("nat", expr("graft_shingle_hashes_md5(text, 5)"))
      .withColumn("ref", composed("text", 5))
    val bad = df.filter(not(col("nat") <=> col("ref"))).collect()
    assert(bad.isEmpty, bad.mkString("\n"))
    // the all-identical-windows doc really dedups to one hash
    assert(df.filter(col("id") === 5L).select(size(col("nat"))).head.getInt(0) === 1)
    // n = 3 as a second window length
    val df3 = rows.toDF("id", "text")
      .withColumn("nat", expr("graft_shingle_hashes_md5(text, 3)"))
      .withColumn("ref", composed("text", 3))
    assert(df3.filter(not(col("nat") <=> col("ref"))).count() === 0)
  }
}
