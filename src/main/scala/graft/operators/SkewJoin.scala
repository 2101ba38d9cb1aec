package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * At 100 TB a handful of hot keys (a viral document, a default user
  * id) can put one shuffle partition hours behind the rest. AQE's
  * skew-join split handles sort-merge cases adaptively; explicit
  * salting is the deterministic, planner-independent control for when
  * the skew is known up front:
  *
  *  - fact side: add `__salt = pmod(xxhash64(<whole row id>), S)` — the
  *    hot key's rows spread over S sub-partitions;
  *  - dimension side: replicate each row S times (`explode(sequence)`);
  *  - join on (key, __salt): same result set as the plain equi-join for
  *    1:N joins (every fact row still meets its dimension row exactly
  *    once), S× the dimension shuffle volume — the dimension is the
  *    small side by assumption, so that's the cheap currency to pay.
  */
object SkewJoin {

  /** `facts ⋈ dim` on `key` with `salt`-way spreading of the fact side.
    * `dim` must be unique per key (dimension semantics); the result
    * equals `facts.join(dim, key)` with `__salt` dropped. */
  def salted(facts: DataFrame, dim: DataFrame, key: String, salt: Int): DataFrame = {
    // deterministic spread: hash ALL fact columns (row identity), so the
    // same row always lands in the same sub-partition (repeatable runs)
    val saltCol = pmod(xxhash64(facts.columns.map(col).toIndexedSeq: _*), lit(salt))
    val f = facts.withColumn("__salt", saltCol)
    val d = dim.withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    f.join(d, Seq(key, "__salt")).drop("__salt")
  }
}
