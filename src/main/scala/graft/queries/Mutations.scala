package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.store.TableStore

/** Mutation operators (SURVEY §2.10 M1-M3) made oracle-checkable: each
  * query seeds a scratch [[TableStore]] from a deterministic slice of
  * `orders`, applies the DML through the store's atomic-commit path, and
  * returns the final committed table; the DuckDB oracle states the same
  * final table relationally (insert = UNION ALL, update = CASE WHEN,
  * remove = anti-filter, upsert = anti-join + UNION).
  */
object Mutations extends QueryPack {

  private val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderpriority")

  private def seed(s: SparkSession, d: String, m: Int): DataFrame =
    t(s, d, "orders").filter(col("o_orderkey") % 10 === m)
      .select(cols.map(col): _*)

  private def scratch(s: SparkSession): TableStore =
    new TableStore(s, Files.createTempDirectory("graft-store-").toString)

  /** m1 — `@insert Exams(s, c)` (`Kernel/README.md:210-216`): append new
    * rows (negated keys keep them disjoint); insert writes new files
    * only. */
  private def m1(s: SparkSession, d: String): DataFrame = {
    val st = scratch(s)
    st.create("orders", seed(s, d, 0))
    val incoming = seed(s, d, 1)
      .withColumn("o_orderkey", -col("o_orderkey"))
      .withColumn("o_totalprice", col("o_totalprice") * 2.0)
    st.insert("orders", incoming)
    st.read("orders")
  }

  /** m1b — `set` into a Unique-indexed table = upsert
    * (`Kernel/Drafts/draft:130` + `Unique` index `Kernel/README.md:64-74`). */
  private def m1b(s: SparkSession, d: String): DataFrame = {
    val st = scratch(s)
    st.create("orders", t(s, d, "orders")
      .filter(col("o_orderkey") % 10 <= 1).select(cols.map(col): _*))
    val incoming = t(s, d, "orders")
      .filter(col("o_orderkey") % 10 === 1 || col("o_orderkey") % 10 === 2)
      .select(cols.map(col): _*)
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
    st.upsert("orders", incoming, Seq("o_orderkey"))
    st.read("orders")
  }

  /** m2 — `@update Exams(student, @score)` (`Kernel/README.md:218-225`):
    * conditional column rewrite through the copy-on-write commit. */
  private def m2(s: SparkSession, d: String): DataFrame = {
    val st = scratch(s)
    st.create("orders", seed(s, d, 0))
    st.update("orders",
      Map("o_totalprice" -> (col("o_totalprice") * 1.1)),
      col("o_orderstatus") === "O")
    st.read("orders")
  }

  /** m3 — `@remove Exams(student, _)  :- cond` (`Kernel/README.md:227-234`). */
  private def m3(s: SparkSession, d: String): DataFrame = {
    val st = scratch(s)
    st.create("orders", seed(s, d, 0))
    st.delete("orders", col("o_orderpriority") === "5-LOW")
    st.read("orders")
  }

  /** m5 — `transaction query` (`Kernel/README.md:251-254`,
    * `Rewrite.md:4-16`): archive-and-delete across two tables in ONE
    * atomic commit; the result proves both effects landed together. */
  private def m5(s: SparkSession, d: String): DataFrame = {
    val st = scratch(s)
    st.create("orders", seed(s, d, 0))
    val cond = col("o_orderpriority") === "5-LOW"
    st.transaction { tx =>
      tx.create("archive", tx.read("orders").filter(cond))
      tx.delete("orders", cond)
    }
    st.read("orders").withColumn("bucket", lit("live"))
      .unionByName(st.read("archive").withColumn("bucket", lit("archived")))
  }

  /** m7 — SCD type-2 dimension maintenance ([[graft.store.Scd2]]):
    * three customer-segment snapshots (seed + two where a key slice
    * changes segment) applied at effective times 1000/2000/3000; the
    * final table must hold per key exactly the CHANGE sequence —
    * versions with adjacent validity intervals, one open row per key,
    * zero churn for unchanged keys. The oracle reconstructs the same
    * history relationally (lag-compare over the three snapshots). */
  private def m7(s: SparkSession, d: String): DataFrame = {
    val st = scratch(s)
    def snap(n: Int): DataFrame = {
      val base = t(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      n match {
        case 0 => base
        case 1 => base.withColumn("c_mktsegment",
          when(col("c_custkey") % 7 === 0, lit("SEG_B1"))
            .otherwise(col("c_mktsegment")))
        case 2 => base.withColumn("c_mktsegment",
          when(col("c_custkey") % 5 === 0, lit("SEG_B2"))
            .when(col("c_custkey") % 7 === 0, lit("SEG_B1"))
            .otherwise(col("c_mktsegment")))
      }
    }
    graft.store.Scd2.init(st, "dim_customer", snap(0), effMicros = 1000L)
    graft.store.Scd2.applyBatch(st, "dim_customer", snap(1),
      Seq("c_custkey"), effMicros = 2000L)
    graft.store.Scd2.applyBatch(st, "dim_customer", snap(2),
      Seq("c_custkey"), effMicros = 3000L)
    st.read("dim_customer")
  }

  /** m8 — full three-branch MERGE ([[graft.store.TableStore.merge]],
    * the reference's `set`-upsert `Kernel/Drafts/draft:130` generalized
    * to SQL MERGE): one atomic commit where matched 5-LOW orders are
    * DELETED, other matched orders are UPDATED from the source
    * (`src_`-namespace expression reading the source's doubled price,
    * target-namespace delete predicate), and unmatched source rows are
    * INSERTED. The oracle states the same final table as a left join +
    * anti-union. */
  private def m8(s: SparkSession, d: String): DataFrame = {
    val st = scratch(s)
    st.create("orders", seed(s, d, 0))
    val source = t(s, d, "orders")
      .filter(col("o_orderkey") % 10 === 0 || col("o_orderkey") % 10 === 3)
      .select(col("o_orderkey"), col("o_custkey"),
        lit("M").as("o_orderstatus"),
        (col("o_totalprice") * 2.0).as("o_totalprice"),
        col("o_orderpriority"))
    st.merge("orders", source, Seq("o_orderkey"),
      updateSet = Map(
        "o_orderstatus" -> lit("M"),
        "o_totalprice" -> col("src_o_totalprice")),
      deleteWhen = Some(col("o_orderpriority") === "5-LOW"))
    st.read("orders")
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m8_merge" -> (m8 _),
    "m1_insert" -> (m1 _),
    "m1b_upsert" -> (m1b _),
    "m2_update" -> (m2 _),
    "m3_remove" -> (m3 _),
    "m5_transaction" -> (m5 _),
    "m7_scd2_dimension" -> (m7 _),
  )

  private val colsSql = cols.mkString(", ")

  override val oracles: Map[String, String] = Map(
    "m8_merge" ->
      """WITH b AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                           o_totalprice, o_orderpriority
                    FROM orders WHERE o_orderkey % 10 = 0),
              s AS (SELECT o_orderkey, o_custkey, 'M' AS o_orderstatus,
                           o_totalprice * 2.0 AS o_totalprice,
                           o_orderpriority
                    FROM orders WHERE o_orderkey % 10 IN (0, 3))
         SELECT b.o_orderkey, b.o_custkey,
                CASE WHEN s.o_orderkey IS NOT NULL THEN 'M'
                     ELSE b.o_orderstatus END AS o_orderstatus,
                CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice
                     ELSE b.o_totalprice END AS o_totalprice,
                b.o_orderpriority
         FROM b LEFT JOIN s ON b.o_orderkey = s.o_orderkey
         WHERE NOT (s.o_orderkey IS NOT NULL
                    AND b.o_orderpriority = '5-LOW')
         UNION ALL
         SELECT s.* FROM s
         WHERE s.o_orderkey NOT IN (SELECT o_orderkey FROM b)""",
    "m7_scd2_dimension" ->
      """WITH v AS (
           SELECT c_custkey AS k, c_mktsegment AS seg, 1000 AS ts
           FROM customer
           UNION ALL
           SELECT c_custkey,
                  CASE WHEN c_custkey % 7 = 0 THEN 'SEG_B1'
                       ELSE c_mktsegment END, 2000
           FROM customer
           UNION ALL
           SELECT c_custkey,
                  CASE WHEN c_custkey % 5 = 0 THEN 'SEG_B2'
                       WHEN c_custkey % 7 = 0 THEN 'SEG_B1'
                       ELSE c_mktsegment END, 3000
           FROM customer),
         d AS (SELECT *, lag(seg) OVER (PARTITION BY k ORDER BY ts) AS prev
               FROM v),
         c AS (SELECT k, seg, ts FROM d WHERE prev IS NULL OR seg <> prev),
         f AS (SELECT k, seg, ts,
                 lead(ts) OVER (PARTITION BY k ORDER BY ts) AS nxt
               FROM c)
         SELECT k AS c_custkey, seg AS c_mktsegment,
                CAST(ts AS BIGINT) AS valid_from,
                CAST(nxt AS BIGINT) AS valid_to,
                nxt IS NULL AS is_current
         FROM f""",
    "m1_insert" ->
      s"""SELECT $colsSql FROM orders WHERE o_orderkey % 10 = 0
         UNION ALL
         SELECT -o_orderkey AS o_orderkey, o_custkey, o_orderstatus,
                o_totalprice * 2.0 AS o_totalprice, o_orderpriority
         FROM orders WHERE o_orderkey % 10 = 1""",
    "m1b_upsert" ->
      s"""SELECT $colsSql FROM orders WHERE o_orderkey % 10 = 0
         UNION ALL
         SELECT o_orderkey, o_custkey, o_orderstatus,
                o_totalprice + 1000.0 AS o_totalprice, o_orderpriority
         FROM orders WHERE o_orderkey % 10 = 1 OR o_orderkey % 10 = 2""",
    "m2_update" ->
      s"""SELECT o_orderkey, o_custkey, o_orderstatus,
                CASE WHEN o_orderstatus = 'O' THEN o_totalprice * 1.1
                     ELSE o_totalprice END AS o_totalprice,
                o_orderpriority
         FROM orders WHERE o_orderkey % 10 = 0""",
    "m3_remove" ->
      s"""SELECT $colsSql FROM orders
         WHERE o_orderkey % 10 = 0 AND NOT (o_orderpriority = '5-LOW')""",
    "m5_transaction" ->
      s"""SELECT $colsSql, 'live' AS bucket FROM orders
         WHERE o_orderkey % 10 = 0 AND NOT (o_orderpriority = '5-LOW')
         UNION ALL
         SELECT $colsSql, 'archived' AS bucket FROM orders
         WHERE o_orderkey % 10 = 0 AND o_orderpriority = '5-LOW'""",
  )
}
