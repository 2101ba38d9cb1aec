package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Schema-evolution operations (the reference's "UPDATE SCHEMA …
  * upload a new data package definition with data moving procedures",
  * `Kernel/README.md:275-282`), re-based on the immutable-manifest
  * store.
  *
  * A table manifest is an ordered LOG of data dirs and schema ops; an
  * op applies — at read time — only to the dirs logged BEFORE it.
  * Files written after the op already carry the new logical schema, so
  * every alter is a METADATA-ONLY commit: at 100 TB, `addColumn` with a
  * backfill expression touches zero data bytes. The expression (which
  * may reference other columns — the "data moving procedure") runs
  * inside the scan's whole-stage codegen on every read until
  * [[TableStore.migrate]] materializes it physically.
  */
sealed trait SchemaOp {
  /** Apply to a frame read from dirs that predate this op. */
  def apply(df: DataFrame): DataFrame
  /** One manifest line (tab-separated, `@`-prefixed). */
  def encode: String
}

/** Add `name` typed `sqlType`; rows from pre-op files read
  * `defaultExpr` (SQL, may reference other columns); absent default =
  * NULL. Files written after the op carry the column physically. */
final case class AddCol(name: String, sqlType: String,
    defaultExpr: Option[String]) extends SchemaOp {
  def apply(df: DataFrame): DataFrame =
    df.withColumn(name,
      defaultExpr.map(expr).getOrElse(lit(null)).cast(sqlType))
  def encode: String =
    s"@addcol\t$name\t$sqlType\t${defaultExpr.getOrElse("")}"
}

final case class DropCol(name: String) extends SchemaOp {
  def apply(df: DataFrame): DataFrame = df.drop(name)
  def encode: String = s"@dropcol\t$name"
}

final case class RenameCol(from: String, to: String) extends SchemaOp {
  def apply(df: DataFrame): DataFrame = df.withColumnRenamed(from, to)
  def encode: String = s"@rename\t$from\t$to"
}

/** Type change (widen/narrow) via SQL cast semantics. */
final case class CastCol(name: String, sqlType: String) extends SchemaOp {
  def apply(df: DataFrame): DataFrame =
    df.withColumn(name, col(name).cast(sqlType))
  def encode: String = s"@cast\t$name\t$sqlType"
}

object SchemaOp {
  def decode(line: String): SchemaOp = {
    val parts = line.split("\t", -1)
    parts(0) match {
      case "@addcol" => AddCol(parts(1), parts(2),
        Option(parts(3)).filter(_.nonEmpty))
      case "@dropcol" => DropCol(parts(1))
      case "@rename" => RenameCol(parts(1), parts(2))
      case "@cast" => CastCol(parts(1), parts(2))
      case other => throw new IllegalArgumentException(
        s"unknown schema-op line: $other")
    }
  }
}

/** One parsed manifest line: a data dir, a schema op, or the table's
  * partition-column property. */
private[store] sealed trait ManifestEntry
private[store] final case class DataDir(dir: String) extends ManifestEntry
private[store] final case class OpEntry(op: SchemaOp) extends ManifestEntry

/** Table property (not a log op): data dirs of this table are written
  * `partitionBy(cols)`, so their files live under `col=value/`
  * subdirectories and an equality/IN filter on a partition column
  * prunes whole directories at planning time — the store-level heir of
  * the reference's `Hash(col)` index design (`Kernel/README.md:62-74`),
  * and the mechanism that lets the streaming-dedup probe open only the
  * buckets a micro-batch's candidate fingerprints can live in. Carried
  * as the first manifest line; inserts and COW rewrites preserve it. */
private[store] final case class PartColsEntry(cols: Seq[String]) extends ManifestEntry

/** Table properties pinned at creation (the Delta/Iceberg
  * table-property analogue): layout parameters the DATA bakes in and
  * every later session must read back from the table rather than from
  * its own conf — e.g. the fingerprint bucket modulus of a
  * hash-partitioned dedup corpus (`fpBuckets`), where a restart with a
  * different session conf would probe `fp mod N'` against dirs labeled
  * `fp mod N` and silently re-admit duplicates. Carried as a property
  * line like [[PartColsEntry]]; COW rewrites, compaction, and inserts
  * preserve it. Keys and values must not contain tabs or newlines. */
private[store] final case class PropsEntry(props: Map[String, String]) extends ManifestEntry

/** Deletion vector (merge-on-read DELETE): `dir` is a table-namespace
  * parquet dir of `(file: String, pos: Long)` rows naming physical rows
  * — by the immutable data file's path and its `_metadata.row_index` —
  * that every read must suppress. A MOR delete of a 100 TB table writes
  * only this tombstone set (bytes ∝ deleted rows) instead of the
  * copy-on-write dir rewrite (bytes ∝ touched dirs); the read path
  * anti-joins the scan against the vector set (small side, broadcast).
  * File paths are globally unique, so a vector applies to the whole
  * log regardless of its line position; vectors referencing files a
  * later rewrite/compaction replaced are dangling no-ops, never wrong.
  * The reference's diff-bitmap design (`Kernel/README.md:6`) applied
  * to row visibility rather than backup. */
private[store] final case class DvEntry(dir: String) extends ManifestEntry

private[store] object ManifestEntry {
  def parse(line: String): ManifestEntry =
    if (line.startsWith("@partcols\t"))
      PartColsEntry(line.split("\t", 2)(1).split(",").toSeq.filter(_.nonEmpty))
    else if (line.startsWith("@dv\t"))
      DvEntry(line.split("\t", 2)(1))
    else if (line.startsWith("@props\t"))
      PropsEntry(line.split("\t").drop(1).filter(_.nonEmpty)
        .map { kv => val i = kv.indexOf('='); kv.take(i) -> kv.drop(i + 1) }.toMap)
    else if (line.startsWith("@")) OpEntry(SchemaOp.decode(line))
    else DataDir(line)
  def encode(e: ManifestEntry): String = e match {
    case DataDir(d) => d
    case OpEntry(op) => op.encode
    case PartColsEntry(cs) => s"@partcols\t${cs.mkString(",")}"
    case DvEntry(d) => s"@dv\t$d"
    case PropsEntry(ps) =>
      "@props\t" + ps.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("\t")
  }
}
