package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.store.{PackageDef, PackageManager, TableStore}

/** Package / instance semantics (`Kernel/README.md:256-273`,
  * `Kernel/Drafts/draft:168-197`): instancing, COW inheritance, atomic
  * merge, discard, visibility, and the no-second-instance module rule. */
class PackagesSpec extends SparkSpec {

  private def freshMgr(): PackageManager =
    new PackageManager(new TableStore(spark,
      Files.createTempDirectory("graft-pkg-spec-").toString))

  private def seedDf = {
    import spark.implicits._
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "v")
  }

  test("inheritance is a pointer copy: no new data files, child reads parent data") {
    val pm = freshMgr()
    pm.define(PackageDef("p", tables = Seq("t")))
    val base = pm.instantiate("p", "base", Map("t" -> seedDf))
    val commitsBefore = pm.store.commitCount()
    val fork = pm.instantiateInheriting(base, "fork")
    assert(pm.read(fork, "t").orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // exactly one metadata commit, and the child table dir holds no data dirs
    assert(pm.store.commitCount() == commitsBefore + 1)
    val childDir = java.nio.file.Paths.get(pm.store.root, fork.table("t"))
    val entries = Files.list(childDir).iterator()
    var dataDirs = 0
    while (entries.hasNext) if (entries.next().getFileName.toString.startsWith("data-")) dataDirs += 1
    assert(dataDirs == 0, "inheriting must not copy data files")
  }

  test("child mutations are copy-on-write: parent snapshot unchanged") {
    val pm = freshMgr()
    pm.define(PackageDef("p", tables = Seq("t")))
    val base = pm.instantiate("p", "base", Map("t" -> seedDf))
    val fork = pm.instantiateInheriting(base, "fork")
    pm.store.update(fork.table("t"), Map("v" -> lit(0.0)), col("id") === 1L)
    pm.store.delete(fork.table("t"), col("id") === 3L)
    assert(pm.read(fork, "t").count() == 2)
    val parent = pm.read(base, "t").orderBy("id").collect()
    assert(parent.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(parent.map(_.getDouble(1)).toSeq == Seq(10.0, 20.0, 30.0))
  }

  test("merge re-points the parent atomically; independent instances stay isolated") {
    val pm = freshMgr()
    pm.define(PackageDef("p", tables = Seq("t")))
    val base = pm.instantiate("p", "base", Map("t" -> seedDf))
    val other = pm.instantiate("p", "other", Map("t" -> seedDf))
    val fork = pm.instantiateInheriting(base, "fork")
    pm.store.update(fork.table("t"), Map("v" -> (col("v") * 2)), lit(true))
    val commitsBefore = pm.store.commitCount()
    pm.merge(fork)
    assert(pm.store.commitCount() == commitsBefore + 1, "merge is ONE commit")
    assert(pm.read(base, "t").agg(sum("v")).head.getDouble(0) == 120.0)
    assert(pm.read(other, "t").agg(sum("v")).head.getDouble(0) == 60.0,
      "independent instance must not see the merge")
  }

  test("discard unpublishes but leaves shared files readable via other instances") {
    val pm = freshMgr()
    pm.define(PackageDef("p", tables = Seq("t")))
    val base = pm.instantiate("p", "base", Map("t" -> seedDf))
    val fork = pm.instantiateInheriting(base, "fork")
    // ordering rule (Kernel/README.md:14): the inheriting child goes
    // first; its manifest pointed at the parent's files, and the
    // unpublish must not have deleted them out from under the parent
    pm.discard(fork)
    assert(!pm.store.exists("fork::t"))
    assert(pm.read(base, "t").count() == 3)
    // and a reader holding the child's snapshot across the discard
    // stays serviceable — unpublish removes names, never files
    val refork = pm.instantiateInheriting(base, "refork")
    val pinned = pm.read(refork, "t")
    pm.discardCascade(base) // refork then base, dependency order
    assert(!pm.store.exists("base::t") && !pm.store.exists("refork::t"))
    assert(pinned.count() == 3)
  }

  test("module rules: duplicate instance name and unknown dependency rejected") {
    val pm = freshMgr()
    pm.define(PackageDef("p", tables = Seq("t")))
    pm.instantiate("p", "solo")
    intercept[IllegalArgumentException](pm.instantiate("p", "solo"))
    intercept[IllegalArgumentException](
      pm.define(PackageDef("q", tables = Seq("u"), using = Seq("missing"))))
  }

  test("public-query visibility across using packages") {
    val pm = freshMgr()
    pm.define(PackageDef("core", tables = Seq("t"),
      publicQueries = Set("Exported")))
    pm.define(PackageDef("app", tables = Seq("u"), using = Seq("core")))
    assert(pm.visible("app", "core", "Exported"))
    assert(!pm.visible("app", "core", "Internal"))
    assert(pm.visible("core", "core", "Internal"),
      "declaring package sees its own private queries")
  }

  test("package declared in HeroQL text: public query compiles cross-package, private is walled") {
    import spark.implicits._
    val pm = freshMgr()
    val src =
      """package core;
        |data T(x: int64, y: int64).
        |public query Exported(x: int64) -> (y: int64) :- T(x, y), y > 1.
        |query Internal(x: int64) :- T(x, _).
        |""".stripMargin
    graft.heroql.HeroQL.definePackage(src, pm)
    graft.heroql.HeroQL.definePackage("package app using core;\ndata U(x: int64).", pm)
    assert(pm.packageOf("core").publicQueries == Set("Exported"))
    val inst = pm.instantiate("core", "prod",
      Map("T" -> Seq((1L, 5L), (2L, 0L)).toDF("x", "y")))
    val rows = graft.heroql.HeroQL.compilePackaged(src, "Exported", "app", pm)(inst)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set((1L, 5L)))
    val e = intercept[graft.heroql.Analyzer.AnalysisError] {
      graft.heroql.HeroQL.compilePackaged(src, "Internal", "app", pm)(inst)
    }
    assert(e.getMessage.contains("not visible"))
    // the declaring package itself reaches its private query
    assert(graft.heroql.HeroQL.compilePackaged(src, "Internal", "core", pm)(inst)
      .count() == 2)
  }

  test("cascade delete: refusals in every out-of-order case, then ordered teardown") {
    import spark.implicits._
    val pm = freshMgr()
    pm.define(PackageDef("base", tables = Seq("T")))
    pm.define(PackageDef("mid", tables = Seq("U"), using = Seq("base")))
    pm.define(PackageDef("top", tables = Seq("V"), using = Seq("mid")))
    val prod = pm.instantiate("base", "prod",
      Map("T" -> Seq((1L, 2L)).toDF("a", "b")))
    val fork = pm.instantiateInheriting(prod, "fork")
    val grand = pm.instantiateInheriting(fork, "grand")
    pm.instantiate("mid", "m1", Map("U" -> Seq(1L).toDF("u")))
    // refusal 1: a package with dependents cannot be undefined
    val e1 = intercept[IllegalStateException](pm.undefine("base"))
    assert(e1.getMessage.contains("mid"))
    // refusal 2: transitive — mid still has top depending on it
    val e2 = intercept[IllegalStateException](pm.undefine("mid"))
    assert(e2.getMessage.contains("top"))
    // refusal 3: an instance with inheriting children cannot discard
    val e3 = intercept[IllegalStateException](pm.discard(prod))
    assert(e3.getMessage.contains("fork"))
    val e3b = intercept[IllegalStateException](pm.discard(fork))
    assert(e3b.getMessage.contains("grand"))
    // refusal 4: dependents gone but instances still live
    pm.deleteCascade("top")
    pm.deleteCascade("mid")
    val e4 = intercept[IllegalStateException](pm.undefine("base"))
    assert(e4.getMessage.contains("prod") || e4.getMessage.contains("instance"))
    // the ordered whole-operation delete: grand → fork → prod → defn
    pm.deleteCascade("base")
    assert(!pm.store.exists(prod.table("T")) &&
      !pm.store.exists(fork.table("T")) && !pm.store.exists(grand.table("T")))
    intercept[IllegalArgumentException](pm.undefine("base")) // already gone
  }

  test("package-instance global: first compile instantiates, later compiles re-bind") {
    val pm = freshMgr()
    graft.heroql.HeroQL.definePackage(
      "package led;\ndata Entries(id: int64, v: double).", pm)
    val program =
      """Books <- new led.
        |query All(id: int64) -> (v: double) :- Books::Entries(id, v).
        |""".stripMargin
    // first compile: the binding instantiates `Books` (empty module —
    // no tables yet, so the atom has nothing to resolve against and
    // analysis refuses; the INSTANCE must exist afterwards regardless)
    intercept[Exception](
      graft.heroql.HeroQL.compileWithPackages(program, "All", Map.empty, pm))
    assert(pm.instance("Books").exists(_.pkg == "led"),
      "first compile must instantiate the package under the global name")
    // data arrives through the store (the reference's "through
    // protocol" posture); the identical declaration now re-binds
    val inst = pm.instance("Books").get
    pm.store.create(inst.table("Entries"), seedDf.toDF("id", "v"))
    val out = graft.heroql.HeroQL.compileWithPackages(program, "All", Map.empty, pm)
    assert(out.orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      == Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)))
    assert(pm.instance("Books").get eq inst, "re-compile must not re-instantiate")
    // binding the same global to a DIFFERENT package refuses
    graft.heroql.HeroQL.definePackage("package other;\ndata X(a: int64).", pm)
    intercept[Exception](graft.heroql.HeroQL.compileWithPackages(
      "Books <- new other.\nquery Q(a: int64) :- Books::X(a).", "Q", Map.empty, pm))
    // an undefined package refuses with a named diagnostic
    val e = intercept[Exception](graft.heroql.HeroQL.compileWithPackages(
      "Ghost <- new nosuch.\nquery Q(a: int64) :- Ghost::X(a).", "Q", Map.empty, pm))
    assert(e.getMessage.contains("nosuch"))
  }

  test("global readonly declarations: parser golden + reserved-name diagnostics") {
    import graft.heroql.{Parser, Ast}
    // golden: both reference forms side by side parse into their buckets
    val p = Parser.parse(
      """Zero <- 0.
        |Students <- new crm.
        |data T(x: int64).
        |query Q(x: int64) :- T(x), x > Zero.
        |""".stripMargin)
    assert(p.globals == Seq("Zero" -> Ast.LInt(0)))
    assert(p.instances == Seq("Students" -> "crm"))
    // a global is readonly: binding the name twice is a parse error
    val dup = intercept[Parser.ParseError](Parser.parse(
      "Zero <- 0.\nZero <- 1.\ndata T(x: int64)."))
    assert(dup.msg.contains("Zero"))
    val dupMixed = intercept[Parser.ParseError](Parser.parse(
      "Books <- new led.\nBooks <- 1.\ndata T(x: int64)."))
    assert(dupMixed.msg.contains("Books"))
    // a global may not reuse a declared relation/query/func name
    val clash = intercept[Parser.ParseError](Parser.parse(
      "data T(x: int64).\nT <- 3.\nquery Q(x: int64) :- T(x)."))
    assert(clash.msg.contains("T"))
  }
}
