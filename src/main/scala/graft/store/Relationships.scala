package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bidirectional relationship fields with cardinality — the reference's
  * GraphDB surface: `parents * children : Person, n..n`
  * (`Kernel/Drafts/draft:36-38`), `data index Grade.classes *
  * Class.grade : n..1` (`Kernel/Drafts/draft_students:23-24`), with the
  * two directions "automatically consistent" (`Kernel/README.md:13`,
  * data-class relationship semantics).
  *
  * Spark mapping: ONE edge table per relationship (src, dst) behind the
  * store's atomic commit; the two directions are two PROJECTIONS of the
  * same committed rows — consistency is structural, not maintained by
  * dual writes. Cardinality is enforced on the MERGED set at link time
  * (the reference indexes enforce it on insert): a violating batch
  * throws and publishes nothing — the transactional no-partial-effects
  * rule. The checks are aggregations (groupBy + max count), so
  * enforcement scales like any other aggregate.
  */
final case class RelDecl(
    name: String,
    from: String, // role name of the src side (e.g. "children")
    to: String,   // role name of the dst side (e.g. "parents")
    card: String) // "1..1" | "n..1" | "1..n" | "n..n"

final class RelationshipStore(val store: TableStore) {

  private var decls = Map.empty[String, RelDecl]
  private def table(rel: String) = s"rel_$rel"

  def declare(rel: RelDecl): Unit = {
    require(Set("1..1", "n..1", "1..n", "n..n")(rel.card),
      s"bad cardinality ${rel.card}")
    decls += rel.name -> rel
  }

  /** Link edges (src, dst): validates cardinality over existing ∪ new,
    * then commits atomically. A violation throws and publishes
    * NOTHING. */
  def link(relName: String, edges: DataFrame): Unit = {
    val rel = decls(relName)
    val t = table(relName)
    val merged =
      (if (store.exists(t)) store.read(t).unionByName(edges) else edges)
        .select(col("src").cast("bigint"), col("dst").cast("bigint"))
        .distinct()
    def maxFan(key: String): Long =
      // coalesce: max over an empty edge set is NULL, not zero
      merged.groupBy(key).count()
        .agg(coalesce(max("count"), lit(0L))).head.getLong(0)
    // n..1: each src at most one dst; 1..n: each dst at most one src
    if ((rel.card == "n..1" || rel.card == "1..1") && maxFan("src") > 1)
      throw new IllegalArgumentException(
        s"$relName: cardinality ${rel.card} violated — a ${rel.from} links multiple ${rel.to}")
    if ((rel.card == "1..n" || rel.card == "1..1") && maxFan("dst") > 1)
      throw new IllegalArgumentException(
        s"$relName: cardinality ${rel.card} violated — a ${rel.to} links multiple ${rel.from}")
    store.create(t, merged)
  }

  /** src → dst direction (e.g. child → parents). */
  def forward(relName: String): DataFrame = store.read(table(relName))

  /** dst → src direction — the SAME committed rows projected the other
    * way, so the two directions can never disagree. */
  def backward(relName: String): DataFrame =
    store.read(table(relName)).select(col("dst").as("src"), col("src").as("dst"))

  def unlink(relName: String, cond: org.apache.spark.sql.Column): Unit =
    store.delete(table(relName), cond)
}
