package graft.store

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** `data class` identity semantics (`Kernel/Drafts/draft:30-42`,
  * `Kernel/README.md:13` "a handle will never be reused"): every
  * inserted instance gets a stable surrogate id allocated above a
  * persistent high-water mark; deletes advance nothing and ids are
  * never handed out twice, so a dangling reference can only miss — it
  * can never silently re-bind to a new object.
  *
  * Allocation is the scalable two-pass shape (`zipWithIndex`): count
  * per partition → cumulative offsets → per-partition sequential ids.
  * No global sort, no single-partition bottleneck, one extra narrow
  * pass — the standard distributed id-assignment. The high-water mark
  * lives beside the store manifest and is advanced BEFORE publishing
  * rows: a crash between the two can burn a range of ids (gap) but can
  * never double-allocate — gaps are allowed, reuse is not. */
final class DataClassStore(val store: TableStore) {

  private def hwPath(name: String) =
    Paths.get(store.root, s"_HIGHWATER_$name")

  private def highWater(name: String): Long =
    if (Files.exists(hwPath(name)))
      new String(Files.readAllBytes(hwPath(name)), "UTF-8").trim.toLong
    else 0L

  private def setHighWater(name: String, v: Long): Unit = {
    Files.createDirectories(Paths.get(store.root))
    Files.write(hwPath(name), v.toString.getBytes("UTF-8"))
  }

  /** Insert instances, allocating `id` above the high-water mark.
    * Returns the committed table. */
  def insertInstances(name: String, rows: DataFrame): DataFrame = {
    val spark = rows.sparkSession
    val base = highWater(name)
    val schema = rows.schema
    val withIds = {
      val rdd = rows.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq((base + 1 + i) +: r.toSeq)
      }
      spark.createDataFrame(rdd,
        org.apache.spark.sql.types.StructType(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType, nullable = false) +: schema.fields))
    }
    val n = withIds.count()
    setHighWater(name, base + n) // advance BEFORE publish: gaps ok, reuse never
    if (store.exists(name)) store.insert(name, withIds)
    else store.create(name, withIds)
    store.read(name)
  }

  /** Delete instances; their handles stay burned forever. */
  def deleteInstances(name: String, cond: org.apache.spark.sql.Column): Unit =
    store.delete(name, cond)

  def read(name: String): DataFrame = store.read(name)
}
