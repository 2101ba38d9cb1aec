package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.operators.MinHashLSH

object DD3Prof {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $name%-22s ${(System.nanoTime()-t0)/1e9}%.3f s"); r
    }
    // replicate dd3 query prep (from MinHashLSH.nearDuplicates)
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val docs = t(spark, d, "documents").select("doc_id", "text").repartition(32)
      val (as, bs) = MinHashLSH.coeffs(63)
      graft.functions.VectorFns.register(spark, as, bs)
      val hashed = phase("hash+sig+checkpoint") {
        docs.select(col("doc_id"),
          expr("graft_shingle_hashes(text, 5)").as("h"))
          .withColumn("_mh", expr("graft_minhash_sig_long(h)"))
          .localCheckpoint()
      }
      val banded = hashed.select(col("doc_id"), explode(expr(
        """transform(sequence(0, 20),
             bi -> struct(bi AS band, xxhash64(slice(_mh, bi * 3 + 1, 3)) AS sig))""")).as("b"))
        .select(col("doc_id"), col("b.band"), col("b.sig"))
      val x = banded.select(col("doc_id").as("a_id"), col("band"), col("sig"))
      val y = banded.select(col("doc_id").as("b_id"), col("band"), col("sig"))
      val cand = phase("raw-candidates") {
        val c = x.join(y, Seq("band", "sig")).filter(col("a_id") < col("b_id"))
          .select("a_id", "b_id").localCheckpoint()
        println(s"  raw pairs: ${c.count()}")
        c
      }
      phase("verify+dedup") {
        val saa = hashed.select(col("doc_id").as("a_id"), col("h").as("sa"))
        val sbb = hashed.select(col("doc_id").as("b_id"), col("h").as("sb"))
        val n = cand.join(broadcast(saa), "a_id").join(broadcast(sbb), "b_id")
          .withColumn("inter", expr("graft_sorted_intersect_bounded(sa, sb, 0.25D)"))
          .withColumn("jaccard", expr("CAST(inter AS DOUBLE) / CAST(size(sa) + size(sb) - inter AS DOUBLE)"))
          .filter(col("jaccard") >= 0.25)
          .dropDuplicates("a_id", "b_id").count()
        println(s"  verified pairs: $n")
      }
      phase("verify-mapPartitions") {
        import spark.implicits._
        val arrs = hashed.select(col("doc_id"), col("h"))
          .as[(Long, Array[Long])].collect()
        val bmap = spark.sparkContext.broadcast(arrs.toMap)
        val thr = 0.25
        val n = cand.as[(Long, Long)].mapPartitions { it =>
          val m = bmap.value
          it.flatMap { case (aId, bId) =>
            val sa = m(aId); val sb = m(bId)
            val needed = math.ceil(thr / (1.0 + thr) * (sa.length + sb.length) - 1e-9).toInt
            var i = 0; var j = 0; var c = 0; var dead = false
            while (!dead && i < sa.length && j < sb.length) {
              val ra = sa.length - i; val rb = sb.length - j
              if (c + math.min(ra, rb) < needed) dead = true
              else {
                val x = sa(i); val y = sb(j)
                if (x == y) { c += 1; i += 1; j += 1 }
                else if (x < y) i += 1 else j += 1
              }
            }
            if (dead) None
            else {
              val jac = c.toDouble / (sa.length + sb.length - c)
              if (jac >= thr) Some((aId, bId, jac)) else None
            }
          }
        }.toDF("a_id", "b_id", "jaccard")
          .dropDuplicates("a_id", "b_id").count()
        println(s"  verified pairs: $n")
        bmap.destroy()
      }
    }
    spark.stop()
  }
}
