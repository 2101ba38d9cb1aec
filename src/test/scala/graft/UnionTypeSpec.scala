package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.types.UnionType

/** The frozen tagged-struct union encoding must survive shuffles and a
  * Parquet round-trip, and variant filters must behave like the
  * `id: Type` pattern (SURVEY §7 hard parts). */
class UnionTypeSpec extends SparkSpec {

  // Contact = Email(string) | Phone(int64) over customers
  private def contacts = {
    val c = Tables.t(spark, sf, "customer")
    c.select(col("c_custkey"), UnionType.encodeWhen(Seq(
      (col("c_custkey") % 2 === 0, 0, concat(col("c_name"), lit("@example.com"))),
      (col("c_custkey") % 2 === 1, 1, (col("c_custkey") * 7).cast("long")),
    ), arity = 2).as("contact"))
  }

  test("exactly the active variant slot is non-null") {
    val bad = contacts.filter(
      (UnionType.isVariant(col("contact"), 0) &&
        (UnionType.variant(col("contact"), 0).isNull ||
          UnionType.variant(col("contact"), 1).isNotNull)) ||
        (UnionType.isVariant(col("contact"), 1) &&
          (UnionType.variant(col("contact"), 1).isNull ||
            UnionType.variant(col("contact"), 0).isNotNull)))
    assert(bad.count() == 0)
  }

  test("encoding survives a shuffle and a parquet round-trip") {
    val dir = Files.createTempDirectory("graft-union-").toString + "/contacts"
    contacts.repartition(4, col("c_custkey")).write.parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == contacts.count())
    // variant filter == parity filter after the round-trip
    val emails = back.filter(UnionType.isVariant(col("contact"), 0))
    assert(emails.filter(col("c_custkey") % 2 =!= 0).count() == 0)
    val phones = back.filter(UnionType.isVariant(col("contact"), 1))
      .select(UnionType.variant(col("contact"), 1).as("p"), col("c_custkey"))
    assert(phones.filter(col("p") =!= col("c_custkey") * 7).count() == 0)
  }

  test("variant counts partition the rows") {
    val n = contacts.count()
    val byTag = contacts.groupBy(UnionType.tagOf(col("contact")).as("tag")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byTag.values.sum == n)
    assert(byTag.keySet == Set(0, 1))
  }
}
