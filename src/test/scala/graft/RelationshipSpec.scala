package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.store.{RelDecl, RelationshipStore, TableStore}

/** Bidirectional relationships with cardinality (`Kernel/Drafts/
  * draft:36-38`, `draft_students:23-24`): both directions are views of
  * one committed edge set; cardinality violations reject the whole
  * batch atomically. */
class RelationshipSpec extends SparkSpec {

  private def fresh() = new RelationshipStore(
    new TableStore(spark, Files.createTempDirectory("graft-rel-").toString))

  test("forward and backward are projections of the same committed rows") {
    import spark.implicits._
    val rs = fresh()
    rs.declare(RelDecl("parent_of", "child", "parent", "n..1"))
    rs.link("parent_of", Seq((10L, 1L), (11L, 1L), (12L, 2L)).toDF("src", "dst"))
    val fwd = rs.forward("parent_of").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bwd = rs.backward("parent_of").collect().map(r => (r.getLong(1), r.getLong(0))).toSet
    assert(fwd == bwd, "directions must be the same rows")
    assert(fwd == Set((10L, 1L), (11L, 1L), (12L, 2L)))
  }

  test("n..1 rejects a child with two parents; nothing is published") {
    import spark.implicits._
    val rs = fresh()
    rs.declare(RelDecl("parent_of", "child", "parent", "n..1"))
    rs.link("parent_of", Seq((10L, 1L)).toDF("src", "dst"))
    intercept[IllegalArgumentException] {
      rs.link("parent_of", Seq((10L, 2L)).toDF("src", "dst")) // second parent
    }
    assert(rs.forward("parent_of").count() == 1, "violating batch must not partially apply")
  }

  test("1..1 enforces both directions; n..n allows anything") {
    import spark.implicits._
    val rs = fresh()
    rs.declare(RelDecl("spouse", "a", "b", "1..1"))
    rs.link("spouse", Seq((1L, 2L)).toDF("src", "dst"))
    intercept[IllegalArgumentException] {
      rs.link("spouse", Seq((3L, 2L)).toDF("src", "dst")) // dst side fan-in
    }
    rs.declare(RelDecl("friends", "a", "b", "n..n"))
    rs.link("friends", Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst"))
    assert(rs.forward("friends").count() == 3)
  }

  test("data-class handles are never reused across delete/insert cycles") {
    import spark.implicits._
    val dc = new graft.store.DataClassStore(
      new TableStore(spark, Files.createTempDirectory("graft-dc-").toString))
    dc.insertInstances("person", Seq("a", "b", "c").toDF("name"))
    val ids1 = dc.read("person").select("id").collect().map(_.getLong(0)).toSet
    assert(ids1 == Set(1L, 2L, 3L))
    dc.deleteInstances("person", col("name") === "b")
    dc.insertInstances("person", Seq("d", "e").toDF("name"))
    val all = dc.read("person").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // the burned handle 2 must NOT be re-assigned to d or e
    assert(all.keySet == Set(1L, 3L, 4L, 5L))
    assert(all(4L) == "d" && all(5L) == "e")
  }

  test("unlink keeps rows where the predicate is null (SQL DELETE semantics)") {
    import spark.implicits._
    val rs = fresh()
    rs.declare(RelDecl("parent_of", "child", "parent", "n..n"))
    rs.link("parent_of", Seq((10L, 1L), (11L, 2L)).toDF("src", "dst"))
    rs.unlink("parent_of", col("dst") === 1L)
    assert(rs.forward("parent_of").collect().map(_.getLong(0)).toSeq == Seq(11L))
  }
}
