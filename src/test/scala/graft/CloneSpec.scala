package graft

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.store.TableStore

/** Shallow clone ([[graft.store.TableStore.cloneTable]]): the
  * package-inheritance COW-ref mechanism surfaced as a table op. The
  * gate (adm14) proves divergence correctness against the DuckDB
  * oracle; these specs pin what the oracle cannot see — that the clone
  * is ZERO-COPY (no parquet bytes written at clone time, the property
  * that makes cloning a 100 TB table a metadata op) and that vacuum
  * keeps base files alive while a clone still references them. */
class CloneSpec extends SparkSpec {

  private def scratch(): TableStore =
    new TableStore(spark, Files.createTempDirectory("graft-clone-").toString)

  private def orders: DataFrame =
    spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")

  private def parquetBytes(dir: Path): Long = {
    if (!Files.exists(dir)) return 0L
    val s = Files.walk(dir)
    try s.iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .map(Files.size(_)).sum
    finally s.close()
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).sorted.toSeq

  test("clone writes zero data bytes and reads equal to the base") {
    val st = scratch()
    st.create("orders", orders.filter(col("o_orderkey") % 10 < 8))
    st.insert("orders", orders.filter(col("o_orderkey") % 10 === 8))
    st.cloneTable("orders", "dev")
    // zero-copy: the clone's table dir holds manifests only
    assert(parquetBytes(Path.of(st.root, "dev")) === 0L,
      "clone time must not copy any parquet bytes")
    assert(sortedRows(st.read("dev")) === sortedRows(st.read("orders")))
  }

  test("divergence is two-way isolated") {
    val st = scratch()
    st.create("orders", orders.filter(col("o_orderkey") % 10 < 5))
    st.cloneTable("orders", "dev")
    val baseBefore = sortedRows(st.read("orders"))
    // clone-side COW delete + insert: base must not move
    st.delete("dev", col("o_orderkey") % 2 === 0)
    st.insert("dev", orders.filter(col("o_orderkey") % 10 === 7))
    assert(sortedRows(st.read("orders")) === baseBefore)
    // base-side mutation after divergence: clone must not move
    val devBefore = sortedRows(st.read("dev"))
    st.update("orders", Map("o_totalprice" -> lit(0.0)),
      col("o_orderkey") % 2 === 1)
    assert(sortedRows(st.read("dev")) === devBefore)
  }

  test("vacuum keeps base files alive while a clone references them") {
    val st = scratch()
    st.create("orders", orders.filter(col("o_orderkey") % 10 === 0))
    st.cloneTable("orders", "dev")
    val expected = sortedRows(st.read("dev"))
    // rewrite the BASE so its old dirs become unreferenced BY THE
    // BASE — the clone's cross-table refs must still pin them
    st.create("orders", orders.filter(col("o_orderkey") % 10 === 1))
    st.vacuum(retainVersions = 1, graceMillis = 0L)
    assert(sortedRows(st.read("dev")) === expected,
      "vacuum reclaimed files still referenced by a clone")
  }
}
