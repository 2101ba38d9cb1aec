package graft

import org.apache.spark.sql.functions._

/** Pins the r20 session-scoped ANN index reuse for the `nearest`
  * language stage (the r19 verdict's top item): the SECOND execution of
  * the same `nearest` query in a session must read the index committed
  * by the first — same store manifest (no rebuild commit), no new
  * graft-hql-annidx-* temp directory — and return row-identical
  * results. A corpus change must still rebuild (the codebook-fp
  * staleness guard), so reuse can never serve a stale index. */
class AnnIndexReuseSpec extends SparkSpec {

  private def nearestQuery(e: org.apache.spark.sql.DataFrame) =
    graft.heroql.HeroQL.compileCollection(
      "data Embeddings(vec_id: int64, embedding: vecf32).\n",
      """collection_query(probe_id, neighbor_id, cos_sim, rank) :-
           Embeddings(vec_id, embedding)
         nearest(vec_id, embedding) k 5 probes 20
           as (probe_id, neighbor_id, cos_sim, rank)
         ;""",
      Map("Embeddings" -> e))

  private def annTmpDirs(): Set[String] = {
    val tmp = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir", "/tmp"))
    val it = java.nio.file.Files.list(tmp).iterator()
    var out = Set.empty[String]
    while (it.hasNext) {
      val p = it.next().getFileName.toString
      if (p.startsWith("graft-hql-annidx-")) out += p
    }
    out
  }

  test("second nearest execution reuses the session index (no rebuild, no new temp dir)") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val dirs0 = annTmpDirs()
    val r1 = nearestQuery(e).collect().sortBy(r => (r.getLong(0), r.getLong(3)))
    val store = graft.heroql.Planner.annIndexStore(spark)
    val m1 = store.currentManifestName("ann_index")
    assert(m1.nonEmpty, "first execution must commit the index")
    val dirs1 = annTmpDirs()
    // at most one new session dir (zero if an earlier test in this JVM
    // session already created it)
    assert((dirs1 -- dirs0).size <= 1)
    val r2 = nearestQuery(e).collect().sortBy(r => (r.getLong(0), r.getLong(3)))
    val m2 = store.currentManifestName("ann_index")
    assert(m2 === m1, "second execution must NOT rebuild the index")
    assert(annTmpDirs() === dirs1, "no new temp dir per execution")
    assert(r1.map(_.toString).toSeq === r2.map(_.toString).toSeq)
  }

  test("a corpus change still rebuilds through the staleness guard") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    nearestQuery(e).collect()
    val store = graft.heroql.Planner.annIndexStore(spark)
    val m1 = store.currentManifestName("ann_index")
    // different corpus (shifted ids + halved vectors) → different
    // codebook sample → different fp → rebuild
    val e2 = e.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id"),
        expr("transform(embedding, x -> x * 0.5F)").as("embedding"))
    nearestQuery(e2).collect()
    val m2 = store.currentManifestName("ann_index")
    assert(m2 !== m1, "a changed corpus must rebuild the index")
  }
}
