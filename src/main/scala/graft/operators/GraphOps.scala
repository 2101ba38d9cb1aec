package graft.operators

import org.apache.spark.graphx.{Edge, Graph, VertexRDD}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** GraphX adapter for analytical graph queries (BASELINE.json
  * "spark_approach": GraphX for analytical queries).
  *
  * The reference's graph surface is bidirectional relationship fields
  * with cardinalities (`parents * children : Person, n..n`,
  * `Kernel/Drafts/draft:36-38`) — i.e. typed edge tables. This adapter
  * lifts an edge DataFrame (srcId, dstId) into a GraphX `Graph` for the
  * iterative algorithms (connected components, PageRank,
  * aggregateMessages) that relational joins express poorly.
  */
object GraphOps {

  /** Build a GraphX graph from an edge DataFrame with long columns
    * `src`, `dst`. */
  def fromEdges(edges: DataFrame): Graph[Int, Int] = {
    val edgeRdd = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), 1))
    Graph.fromEdges(edgeRdd, defaultValue = 0,
      edgeStorageLevel = StorageLevel.MEMORY_AND_DISK,
      vertexStorageLevel = StorageLevel.MEMORY_AND_DISK)
  }

  /** Connected components → DataFrame(node, component). */
  def connectedComponents(spark: SparkSession, edges: DataFrame): DataFrame = {
    import spark.implicits._
    fromEdges(edges).connectedComponents()
      .vertices.map { case (v, c) => (v, c) }
      .toDF("node", "component")
  }

  /** Static PageRank (fixed iterations) → DataFrame(node, rank). */
  def staticPageRank(spark: SparkSession, edges: DataFrame, iters: Int,
      resetProb: Double = 0.15): DataFrame = {
    import spark.implicits._
    fromEdges(edges).staticPageRank(iters, resetProb)
      .vertices.map { case (v, r) => (v, r) }
      .toDF("node", "rank")
  }

  /** Two aggregateMessages passes over a child→parent edge set: per
    * node, the number of children and grandchildren. */
  def childAndGrandchildCounts(spark: SparkSession, edges: DataFrame): DataFrame = {
    import spark.implicits._
    val g = fromEdges(edges)
    val children: VertexRDD[Long] =
      g.aggregateMessages[Long](ctx => ctx.sendToDst(1L), _ + _)
    val withCounts = g.outerJoinVertices(children) {
      (_, _, c) => c.getOrElse(0L)
    }
    val grandchildren: VertexRDD[Long] =
      withCounts.aggregateMessages[Long](ctx => ctx.sendToDst(ctx.srcAttr), _ + _)
    children.leftJoin(grandchildren) { (_, c, gc) => (c, gc.getOrElse(0L)) }
      .map { case (v, (c, gc)) => (v, c, gc) }
      .toDF("node", "n_children", "n_grandchildren")
  }
}
