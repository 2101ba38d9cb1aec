package graft.types

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tagged-union encoding — HeroQL `A | B` types (`Kernel/README.md:36-39`,
  * ADTs via unions of structs `Kernel/Drafts/draft:21-23`).
  *
  * FROZEN ENCODING (SURVEY §7 hard parts — decided once, round-trips
  * through shuffles and Parquet): a union of n variants is
  * `struct(tag: int, v0: T0, v1: T1, ..., v{n-1}: T{n-1})` where exactly
  * the `v<tag>` field is non-null. Parquet stores nulls columnar-sparse,
  * so inactive variants cost no data pages; the tag column predicate-
  * pushes for variant filters (`id: Type` patterns →
  * `tag = k` — `Kernel/Drafts/draft:120-126`).
  */
object UnionType {

  /** Conditional encode: pick the variant per row.
    * `cases` = (condition, tag, value); conditions checked in order.
    * All variant value expressions must be supplied so the struct schema
    * is stable across rows. */
  def encodeWhen(cases: Seq[(Column, Int, Column)], arity: Int): Column = {
    val tagCol = cases.foldLeft(Option.empty[Column]) { case (acc, (c, t, _)) =>
      Some(acc.map(_.when(c, lit(t))).getOrElse(when(c, lit(t))))
    }.get
    val slots = (0 until arity).map { i =>
      cases.filter(_._2 == i).foldLeft(Option.empty[Column]) {
        case (acc, (c, _, v)) =>
          Some(acc.map(_.when(c, v)).getOrElse(when(c, v)))
      }.map(_.otherwise(lit(null))).getOrElse(lit(null)).as(s"v$i")
    }
    struct((lit(0) + tagCol).cast("int").as("tag") +: slots: _*)
  }

  /** `id: Type` pattern — variant filter on the tag. */
  def isVariant(u: Column, tag: Int): Column = u.getField("tag") === tag

  /** Extract the payload of variant `tag` (null for other variants). */
  def variant(u: Column, tag: Int): Column = u.getField(s"v$tag")

  def tagOf(u: Column): Column = u.getField("tag")
}
