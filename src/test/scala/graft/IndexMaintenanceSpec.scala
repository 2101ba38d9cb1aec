package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.queries.Similarity
import graft.store.TableStore

/** Incremental ANN index maintenance (ann9): append-only growth,
  * fresh-row reachability, pruning preserved, recall vs brute force. */
class IndexMaintenanceSpec extends SparkSpec {

  test("incremental batches append (never rewrite), reach queries, and keep recall") {
    val store = new TableStore(spark,
      Files.createTempDirectory("graft-annincr-spec-").toString)
    val r = Similarity.incrementalIndexTopK(spark, sf, store, "ann_index")
    val rows = r.collect()
    assert(rows.nonEmpty)
    // append-only: base commit + two incremental inserts = 3 data dirs,
    // and every dir of an earlier commit is still in the final manifest
    // (an insert that rewrote the index would fold them away)
    val dirs = store.dataDirs("ann_index")
    assert(dirs.size == 3, s"expected 3 append dirs, got $dirs")
    // the incremental rows are REACHABLE: the index covers the full
    // corpus, so some neighbor must come from the incrementally-added
    // fifth (vec_id % 5 == 0; probes are vec_id < 20 so 0,5,10,15 are
    // also probe ids — look at neighbors only)
    assert(rows.exists(_.getAs[Long]("neighbor_id") % 5 == 0),
      "no incrementally-added vector ever surfaced as a neighbor")
    // partition pruning still prunes on the grown index: a one-list
    // read touches a strict subset of the committed index files
    val lists = store.read("ann_index").select("list").distinct()
      .collect().map(_.getInt(0))
    val one = store.read("ann_index").filter(col("list") === lists.head)
    // execute through the df's own queryExecution so the scan metrics
    // fill (the StoreBucketPruningSpec convention)
    def filesScanned(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numFiles").value
      }.foldLeft(0L)(_ + _)
    }
    val scanned = filesScanned(one)
    val all = filesScanned(store.read("ann_index"))
    assert(scanned < all, s"one-list read scanned all $all files")
    // recall floor vs exact brute force (the ann4/5 convention)
    val exact = Similarity.queries("ann1_bruteforce_topk")(spark, sf)
      .select("probe_id", "neighbor_id")
    val total = exact.count()
    val hit = exact.intersect(r.select("probe_id", "neighbor_id")).count()
    assert(hit.toDouble / total >= 0.3,
      s"incremental-index recall $hit/$total below floor")
  }
}
