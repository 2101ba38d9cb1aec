package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.store.{CheckConstraints, TableStore}

/** Write-path CHECK constraints ([[graft.store.CheckConstraints]]):
  * batch admission, whole-batch rejection with nothing committed, and
  * declaration-time validation of existing rows. */
class CheckConstraintsSpec extends SparkSpec {

  private def seeded(): TableStore = {
    val st = new TableStore(spark,
      Files.createTempDirectory("graft-check-spec-").toString)
    st.create("orders", spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderkey") % 10 === 0)
      .select("o_orderkey", "o_totalprice", "o_orderstatus"))
    st
  }

  test("a conforming batch is admitted, a violating one rejected whole") {
    val st = seeded()
    CheckConstraints.declare(st, "orders", "price_nonneg", "o_totalprice >= 0.0")
    val good = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderkey") % 10 === 1)
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
    CheckConstraints.insert(st, "orders", good)
    val after = st.read("orders").count()
    val commits = st.commitCount()
    // one violating row poisons the WHOLE batch
    val mixed = good.withColumn("o_totalprice",
      when(col("o_orderkey") % 3 === 0, -col("o_totalprice"))
        .otherwise(col("o_totalprice")))
    val e = intercept[CheckConstraints.CheckViolation] {
      CheckConstraints.insert(st, "orders", mixed)
    }
    assert(e.constraint === "price_nonneg" && e.violations > 0)
    assert(st.read("orders").count() === after,
      "a rejected batch must leave the table untouched")
    assert(st.commitCount() === commits,
      "a rejected batch must not commit anything")
  }

  test("declaration validates the existing rows") {
    val st = seeded()
    val e = intercept[CheckConstraints.CheckViolation] {
      CheckConstraints.declare(st, "orders", "impossible", "o_totalprice < 0.0")
    }
    assert(e.violations > 0)
    // the failed declaration must not register: a batch that violates
    // the undeclared predicate still inserts
    CheckConstraints.insert(st, "orders",
      spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_orderkey") % 10 === 1)
        .select("o_orderkey", "o_totalprice", "o_orderstatus"))
  }

  test("unique key rejects batch-internal dups and committed-key clashes") {
    val st = seeded()
    CheckConstraints.declareUnique(st, "orders", "pk", Seq("o_orderkey"))
    val fresh = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderkey") % 10 === 1)
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
    CheckConstraints.insert(st, "orders", fresh)
    // batch-internal duplicate
    val e1 = intercept[CheckConstraints.CheckViolation] {
      CheckConstraints.insert(st, "orders",
        fresh.limit(5).unionAll(fresh.limit(5)))
    }
    assert(e1.constraint === "pk")
    // clash with already-committed keys
    val e2 = intercept[CheckConstraints.CheckViolation] {
      CheckConstraints.insert(st, "orders", fresh.limit(3))
    }
    assert(e2.constraint === "pk")
    // declaration over an already-duplicated table rejects
    val st2 = seeded()
    st2.insert("orders", st2.read("orders").limit(4))
    intercept[CheckConstraints.CheckViolation] {
      CheckConstraints.declareUnique(st2, "orders", "pk", Seq("o_orderkey"))
    }
  }

  test("foreign key rejects orphans at insert and at declaration") {
    val st = seeded()
    st.create("customers", spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey"))
    // re-seed orders WITH custkey for the fk
    st.create("orders", spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderkey") % 10 === 0)
      .select("o_orderkey", "o_custkey", "o_totalprice"))
    CheckConstraints.declareForeignKey(st, "orders", "fk",
      Seq("o_custkey"), "customers", Seq("c_custkey"))
    val fresh = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderkey") % 10 === 1)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    CheckConstraints.insert(st, "orders", fresh)
    val e = intercept[CheckConstraints.CheckViolation] {
      CheckConstraints.insert(st, "orders",
        fresh.withColumn("o_custkey", -col("o_custkey")))
    }
    assert(e.constraint === "fk" && e.violations > 0)
    // declaring over existing orphans rejects
    val st2 = seeded()
    st2.create("customers", spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey").filter(col("c_custkey") % 2 === 0))
    st2.create("orders", spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey").limit(200))
    intercept[CheckConstraints.CheckViolation] {
      CheckConstraints.declareForeignKey(st2, "orders", "fk",
        Seq("o_custkey"), "customers", Seq("c_custkey"))
    }
  }

  test("multiple constraints all gate the same insert") {
    val st = seeded()
    CheckConstraints.declare(st, "orders", "price_nonneg", "o_totalprice >= 0.0")
    CheckConstraints.declare(st, "orders", "status_enum",
      "o_orderstatus IN ('O', 'F', 'P')")
    val badStatus = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderkey") % 10 === 1)
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
      .withColumn("o_orderstatus", lit("X"))
    val e = intercept[CheckConstraints.CheckViolation] {
      CheckConstraints.insert(st, "orders", badStatus)
    }
    assert(e.constraint === "status_enum")
  }

  test("update admission: post-image CHECK violations reject whole") {
    val st = seeded()
    CheckConstraints.declare(st, "orders", "price_nonneg", "o_totalprice >= 0.0")
    val before = st.read("orders").collect().map(_.toSeq.mkString("|")).sorted.toSeq
    val e = intercept[CheckConstraints.CheckViolation] {
      st.update("orders", Map("o_totalprice" -> (col("o_totalprice") - 1e9)),
        col("o_orderkey") % 3 === 0)
    }
    assert(e.constraint === "price_nonneg" && e.violations > 0)
    assert(st.read("orders").collect().map(_.toSeq.mkString("|")).sorted.toSeq
      === before, "a rejected update must leave the table untouched")
    // a conforming update sails through
    st.update("orders", Map("o_totalprice" -> (col("o_totalprice") + 1.0)),
      col("o_orderkey") % 3 === 0)
  }

  test("update admission: retargeting an FK to an orphan value rejects") {
    val st = new TableStore(spark,
      Files.createTempDirectory("graft-check-upd-").toString)
    st.create("dim", spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_mktsegment"))
    st.create("fact", spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderkey") % 5 === 0)
      .select("o_orderkey", "o_custkey"))
    CheckConstraints.declareForeignKey(st, "fact", "fk",
      Seq("o_custkey"), "dim", Seq("c_custkey"))
    intercept[CheckConstraints.CheckViolation] {
      st.update("fact", Map("o_custkey" -> -col("o_custkey")),
        col("o_orderkey") % 10 === 0)
    }
    // an update that keeps fk values inside the dim is admitted
    // (nonzero: the RESTRICT probe below negates it, and -0 == 0)
    val anyKey = st.read("dim").select("c_custkey")
      .filter(col("c_custkey") > 0).head.getLong(0)
    st.update("fact", Map("o_custkey" -> lit(anyKey)),
      col("o_orderkey") % 10 === 0)
    // rewriting a REFERENCED dim key refuses (set-level RESTRICT)
    intercept[CheckConstraints.CheckViolation] {
      st.update("dim", Map("c_custkey" -> -col("c_custkey")),
        col("c_custkey") === anyKey)
    }
  }

  test("update admission: unique-key collisions reject") {
    val st = seeded()
    CheckConstraints.declareUnique(st, "orders", "pk", Seq("o_orderkey"))
    // mapping a slice onto keys the untouched rows still hold clashes
    intercept[CheckConstraints.CheckViolation] {
      st.update("orders", Map("o_orderkey" -> (col("o_orderkey") + 10L)),
        col("o_orderkey") % 20 === 0)
    }
    // a collision-free rekey (disjoint target space) is admitted
    st.update("orders", Map("o_orderkey" -> (col("o_orderkey") + 1L)),
      col("o_orderkey") % 20 === 0)
  }

  private def nonUniqueDimFixture(): TableStore = {
    import spark.implicits._
    val st = new TableStore(spark,
      Files.createTempDirectory("graft-check-spec-").toString)
    // NON-unique referenced side: key 1 carried by two rows
    st.create("dim", Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "tag"))
    st.create("fact", Seq((10L, 1L)).toDF("id", "fk"))
    CheckConstraints.declareForeignKey(st, "fact", "fk1",
      Seq("fk"), "dim", Seq("k"))
    st
  }

  test("set-level RESTRICT: a referenced key stays alive while any carrier survives") {
    // deleting ONE of two carriers of the referenced key keeps the key
    // alive — must be admitted (the old row-level check falsely refused)
    val st = nonUniqueDimFixture()
    st.delete("dim", col("tag") === "a")
    assert(st.read("dim").count() === 2)
    // the LAST carrier: the key disappears — refused
    intercept[CheckConstraints.CheckViolation] {
      st.delete("dim", col("tag") === "b")
    }
    // same algebra on the merge-on-read path
    val st2 = nonUniqueDimFixture()
    st2.deleteMor("dim", col("tag") === "a")
    assert(st2.read("dim").count() === 2)
    intercept[CheckConstraints.CheckViolation] {
      st2.deleteMor("dim", col("tag") === "b")
    }
  }

  test("HeroQL @remove and @remove_mor are gated by referential RESTRICT") {
    import spark.implicits._
    val program = """
data Dim(k: int, tag: string).

query PurgeDim(k: int)
:-  @remove_mor Dim(k, _)
.

query DropDim(k: int)
:-  @remove Dim(k, _)
.
"""
    def fixture(): TableStore = {
      val st = new TableStore(spark,
        Files.createTempDirectory("graft-check-spec-").toString)
      st.create("Dim", Seq((1, "a"), (2, "b")).toDF("k", "tag"))
      st.create("fact", Seq((10, 1)).toDF("id", "fk"))
      CheckConstraints.declareForeignKey(st, "fact", "fkq",
        Seq("fk"), "Dim", Seq("k"))
      st
    }
    // unreferenced key: both language routes admit
    val st = fixture()
    graft.heroql.HeroQL.executeMutation(program, "PurgeDim",
      Seq(2).toDF("k"), st)
    assert(st.read("Dim").count() === 1)
    // referenced key: both routes refuse whole (a language-level MOR
    // delete must not orphan rows the facade delete would protect —
    // FkJoinElim's dim-side soundness depends on this gate)
    intercept[CheckConstraints.CheckViolation] {
      graft.heroql.HeroQL.executeMutation(program, "PurgeDim",
        Seq(1).toDF("k"), st)
    }
    intercept[CheckConstraints.CheckViolation] {
      graft.heroql.HeroQL.executeMutation(program, "DropDim",
        Seq(1).toDF("k"), st)
    }
    assert(st.read("Dim").count() === 1,
      "a refused language delete must commit nothing")
    assert(st.read("Dim").head.getInt(0) === 1)
  }
}
