package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access for the driver-generated test warehouse (repo:TESTDATA.md).
  *
  * The reference's storage kernel (pages + mmap + WAL,
  * `Kernel/Source/Utility/FileBuffer.cpp:619-648`) is deliberately NOT
  * ported: Parquet columnar files + Spark's vectorized reader replace the
  * page/buffer layer entirely (SURVEY.md §1.3). A table scan of a `data`
  * collection (`Kernel/README.md:56-60`) is `spark.read.parquet` — filters
  * and projections applied on top reach the scan via Catalyst pushdown.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Scan one table of the warehouse at `dir`. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
