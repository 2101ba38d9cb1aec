package graft.store

import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import java.util.UUID
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed mutable table store — the semantic heir of the
  * reference's storage kernel, re-based on immutable columnar files.
  *
  * Reference mechanics → store mechanics:
  *  - WAL + commit (`Kernel/Source/Utility/Log.cpp:316-387`,
  *    `LogManager::OpenTransaction` `Log.cpp:523-531`) → every commit
  *    writes a new manifest file and atomically renames a pointer file
  *    (`_CURRENT`) onto it; the manifest history IS the commit log, and
  *    recovery = read `_CURRENT` (crash mid-write leaves the old pointer
  *    intact).
  *  - "queue updates parallelly, apply single-threaded"
  *    (`Rewrite.md:11-15`) → single-writer last-committer-wins pointer
  *    swap; readers always see a consistent snapshot (the manifest they
  *    opened), i.e. snapshot isolation for free from immutability.
  *  - Page reuse/locks (`Buffer.cpp`, `Lock.cpp`) → not ported: Parquet
  *    files are immutable, so no lock hierarchy is needed for analytics
  *    (SURVEY §3 E3).
  *
  * Mutation surface (SURVEY §2.10):
  *  - `@insert` / `set` (M1, `Kernel/README.md:210-216`) → [[insert]]
  *    appends NEW FILES ONLY plus a manifest that references old + new —
  *    at 100 TB an append never rewrites existing data.
  *  - `set` into a `Unique`-indexed table (M1 upsert) → [[upsert]]:
  *    copy-on-write anti-join merge.
  *  - `@update` (M2, `Kernel/README.md:218-225`) → [[update]]:
  *    conditional column rewrite, copy-on-write.
  *  - `@remove` (M3, `Kernel/README.md:227-234`) → [[delete]] /
  *    [[truncate]].
  *  - `uncache` (M4, `Kernel/Drafts/draft:135-136`) → [[drop]].
  */
final class TableStore(val spark: SparkSession, val root: String) {

  private def tableDir(name: String): Path = Paths.get(root, name)
  private def currentPtr(name: String): Path = tableDir(name).resolve("_CURRENT")

  private def readManifest(name: String): Seq[String] = {
    val mf = new String(Files.readAllBytes(currentPtr(name)), "UTF-8").trim
    val manifestPath = tableDir(name).resolve(mf)
    Files.readAllLines(manifestPath, java.nio.charset.StandardCharsets.UTF_8)
      .asScala.toSeq.filter(_.nonEmpty)
  }

  /** Atomically publish a new manifest listing `dataDirs`; readers see
    * either the old or the new table, never a mix. */
  private def commit(name: String, dataDirs: Seq[String]): Unit = {
    val dir = tableDir(name)
    Files.createDirectories(dir)
    val manifestName = s"manifest-${System.currentTimeMillis()}-${UUID.randomUUID().toString.take(8)}"
    Files.write(dir.resolve(manifestName),
      dataDirs.mkString("\n").getBytes("UTF-8"))
    val tmp = dir.resolve(s"_CURRENT.tmp.${UUID.randomUUID().toString.take(8)}")
    Files.write(tmp, manifestName.getBytes("UTF-8"))
    Files.move(tmp, currentPtr(name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def writeData(name: String, df: DataFrame): String = {
    val sub = s"data-${UUID.randomUUID().toString.take(12)}"
    df.write.mode("overwrite").parquet(tableDir(name).resolve(sub).toString)
    sub
  }

  def exists(name: String): Boolean = Files.exists(currentPtr(name))

  /** Create (or replace) a table from a DataFrame. */
  def create(name: String, df: DataFrame): Unit =
    commit(name, Seq(writeData(name, df)))

  /** Snapshot read of the current committed version. */
  def read(name: String): DataFrame = {
    val dirs = readManifest(name).map(d => tableDir(name).resolve(d).toString)
    spark.read.parquet(dirs: _*)
  }

  /** M1 `@insert`: append-only — writes only the new rows' files; the
    * new manifest references old + new data dirs. */
  def insert(name: String, rows: DataFrame): Unit = {
    val newDir = writeData(name, rows)
    commit(name, readManifest(name) :+ newDir)
  }

  /** M1 `set` into a `Unique`-indexed table: upsert by key columns —
    * copy-on-write merge (rows matching an incoming key are replaced).
    * At scale this is one shuffle-free broadcast anti-join when the
    * incoming batch is small, or a key-partitioned merge otherwise —
    * Catalyst picks via AQE. */
  def upsert(name: String, rows: DataFrame, keys: Seq[String]): Unit = {
    val merged = read(name).join(rows.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(rows)
    create(name, merged)
  }

  /** M2 `@update ... :- cond`: conditional column rewrite (copy-on-write). */
  def update(name: String, assignments: Map[String, Column], cond: Column): Unit = {
    val cur = read(name)
    val updated = assignments.foldLeft(cur) { case (df, (c, e)) =>
      df.withColumn(c, when(cond, e).otherwise(col(c)))
    }
    create(name, updated)
  }

  /** M3 `@remove ... :- cond`: anti-filter rewrite. */
  def delete(name: String, cond: Column): Unit =
    create(name, read(name).filter(!cond))

  /** M3 `remove Table`: truncate to empty (schema preserved). */
  def truncate(name: String): Unit =
    create(name, read(name).filter(lit(false)))

  /** M4 `uncache Table`: drop the materialization entirely. */
  def drop(name: String): Unit = {
    val dir = tableDir(name)
    if (Files.exists(dir)) {
      Files.walk(dir).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
  }

  /** Committed manifest count — the commit-log length (observability of
    * the WAL analogue; used by specs to assert atomic publication). */
  def versionCount(name: String): Int =
    Files.list(tableDir(name)).iterator().asScala
      .count(_.getFileName.toString.startsWith("manifest-"))
}
