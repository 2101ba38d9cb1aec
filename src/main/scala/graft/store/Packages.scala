package graft.store

import org.apache.spark.sql.DataFrame

/** Data packages and package instances — the reference's module system
  * (`Kernel/README.md:256-273` "DATA PACKAGE": declaration with
  * `package NAME using P1, P2 ...`, public queries, and the operations
  * "instantiate an independent data package / discard / instantiate
  * inheriting from another one / merge an inheriting instance to its
  * parent"; `Kernel/Drafts/draft:168-197`: "a database is a group of
  * files; a database instance is an installed database with data; ...
  * database likes assembly, module likes appdomain").
  *
  * Spark-first mapping:
  *  - package        → schema declaration (table names + public query
  *                     names + `using` edges), a catalog-level object
  *  - module         → one [[TableStore]] root ("appdomain": instances
  *                     inside one store may share data files; two stores
  *                     never exchange anything)
  *  - instance       → a table-name namespace `<instance>::<table>`
  *                     inside the store
  *  - inheritance    → COPY-ON-WRITE AT THE MANIFEST LEVEL: the child's
  *                     table manifests point at the parent's immutable
  *                     parquet data dirs (root-relative refs) — zero
  *                     bytes copied at instantiation regardless of data
  *                     size, mutations in the child write child-local
  *                     files only. This is the 100 TB-safe shape: fork a
  *                     whole database instance in O(#tables) metadata
  *                     writes.
  *  - merge          → re-point every parent table at the child's
  *                     current dirs in ONE store-manifest swap (the same
  *                     multi-table atomic commit as `transaction query`)
  *  - discard        → unpublish the instance's names; files stay (they
  *                     may be pointer-shared with other instances — GC
  *                     is a vacuum concern, not a correctness one)
  *
  * The no-cycle `using` dependency rule and public-query visibility
  * (`public QUERY | TRANSACTION`) are enforced at definition/resolution
  * time.
  */
final case class PackageDef(
    name: String,
    tables: Seq[String],
    publicQueries: Set[String] = Set.empty,
    using: Seq[String] = Seq.empty)

final class PackageManager(val store: TableStore) {

  private var packages = Map.empty[String, PackageDef]
  private var instances = Map.empty[String, Instance] // instance name -> handle

  final case class Instance(name: String, pkg: String, parent: Option[String]) {
    /** Physical store-table name of a logical package table. */
    def table(logical: String): String = s"$name::$logical"
  }

  def define(pkg: PackageDef): Unit = {
    pkg.using.foreach { dep =>
      if (!packages.contains(dep))
        throw new IllegalArgumentException(
          s"package ${pkg.name}: unknown dependency $dep")
    }
    // dependencies must already exist and redefinition is rejected, so
    // the `using` graph is acyclic by construction
    if (packages.contains(pkg.name))
      throw new IllegalArgumentException(s"package ${pkg.name} already defined")
    packages += pkg.name -> pkg
  }

  def packageOf(name: String): PackageDef = packages(name)

  /** Cross-package query visibility: within the declaring package
    * everything is visible; from a `using` package only `public`
    * queries are. */
  def visible(fromPkg: String, declaringPkg: String, query: String): Boolean =
    fromPkg == declaringPkg ||
      (packages(fromPkg).using.contains(declaringPkg) &&
        packages(declaringPkg).publicQueries.contains(query))

  /** Instantiate an independent instance; `seed` provides initial data
    * per logical table (unseeded tables are not materialized until
    * written). One atomic commit publishes the whole instance. */
  def instantiate(pkgName: String, instName: String,
      seed: Map[String, DataFrame] = Map.empty): Instance = {
    val pkg = packages.getOrElse(pkgName,
      throw new IllegalArgumentException(s"unknown package $pkgName"))
    if (instances.contains(instName))
      throw new IllegalArgumentException(
        s"instance $instName already exists in this module")
    val inst = Instance(instName, pkg.name, None)
    store.transaction { tx =>
      seed.foreach { case (logical, df) =>
        require(pkg.tables.contains(logical),
          s"package $pkgName has no table $logical")
        tx.create(inst.table(logical), df)
      }
    }
    instances += instName -> inst
    inst
  }

  /** Instantiate inheriting from `parent`: every parent table becomes
    * visible in the child via manifest pointer-copy (no data copied);
    * subsequent child mutations are copy-on-write. */
  def instantiateInheriting(parent: Instance, instName: String): Instance = {
    if (instances.contains(instName))
      throw new IllegalArgumentException(
        s"instance $instName already exists in this module")
    val pkg = packages(parent.pkg)
    val child = Instance(instName, parent.pkg, Some(parent.name))
    store.transaction { tx =>
      pkg.tables.foreach { logical =>
        val pt = parent.table(logical)
        if (store.exists(pt)) tx.link(child.table(logical), store.entriesAsRefs(pt))
      }
    }
    instances += instName -> child
    child
  }

  /** Merge an inheriting instance back to its parent: one atomic
    * multi-table pointer swap, exactly the `transaction query` commit
    * shape. The child remains usable (its tables are untouched). */
  def merge(child: Instance): Unit = {
    val parentName = child.parent.getOrElse(
      throw new IllegalArgumentException(
        s"instance ${child.name} does not inherit from anything"))
    val parent = instances(parentName)
    val pkg = packages(child.pkg)
    store.transaction { tx =>
      pkg.tables.foreach { logical =>
        val ct = child.table(logical)
        if (store.exists(ct)) tx.link(parent.table(logical), store.entriesAsRefs(ct))
      }
    }
  }

  /** Discard an instance: unpublish its namespace in one commit. Files
    * stay on disk — they may be pointer-shared with other instances.
    * REFUSES while inheriting child instances exist (the reference's
    * delete-ordering rule, `Kernel/README.md:14`: a whole can only go
    * once everything depending on it has gone) — discard the children
    * first, or use [[discardCascade]]. */
  def discard(inst: Instance): Unit = {
    val children = instances.values.filter(_.parent.contains(inst.name))
    if (children.nonEmpty)
      throw new IllegalStateException(
        s"cannot discard instance ${inst.name}: inheriting instance(s) " +
          s"${children.map(_.name).mkString(", ")} depend on it — " +
          "discard them first (or discardCascade)")
    val pkg = packages(inst.pkg)
    store.unpublish(pkg.tables.map(inst.table))
    instances -= inst.name
  }

  /** Discard an instance AND every instance inheriting from it,
    * children before parents — the ordered whole-operation delete the
    * reference specifies (`Kernel/README.md:14`). */
  def discardCascade(inst: Instance): Unit = {
    instances.values.filter(_.parent.contains(inst.name))
      .toSeq.sortBy(_.name).foreach(discardCascade)
    discard(inst)
  }

  /** Packages that `using`-depend on `pkgName` (direct dependents). */
  def dependentsOf(pkgName: String): Seq[String] =
    packages.values.filter(_.using.contains(pkgName)).map(_.name).toSeq.sorted

  /** Delete a package DEFINITION. Refuses while any package depends on
    * it or any of its instances is still live — "a data package can be
    * deleted as a whole operation, which require all other packages
    * that depend on it are deleted" (`Kernel/README.md:14`). */
  def undefine(pkgName: String): Unit = {
    require(packages.contains(pkgName), s"unknown package $pkgName")
    val deps = dependentsOf(pkgName)
    if (deps.nonEmpty)
      throw new IllegalStateException(
        s"cannot delete package $pkgName: package(s) " +
          s"${deps.mkString(", ")} depend on it — delete them first " +
          "(or deleteCascade)")
    val live = instances.values.filter(_.pkg == pkgName).map(_.name).toSeq.sorted
    if (live.nonEmpty)
      throw new IllegalStateException(
        s"cannot delete package $pkgName: live instance(s) " +
          s"${live.mkString(", ")} — discard them first (or deleteCascade)")
    packages -= pkgName
  }

  /** Whole-package cascade delete in reverse dependency order:
    * dependent packages go first (recursively), each package's
    * instances discard children-before-parents, then the definition
    * leaves. After this, nothing in the module references `pkgName`. */
  def deleteCascade(pkgName: String): Unit = {
    require(packages.contains(pkgName), s"unknown package $pkgName")
    dependentsOf(pkgName).foreach(deleteCascade)
    instances.values.filter(_.pkg == pkgName).toSeq
      .filter(_.parent.isEmpty).sortBy(_.name).foreach(discardCascade)
    // orphans whose parents were discarded earlier in this cascade
    instances.values.filter(_.pkg == pkgName).toSeq
      .sortBy(_.name).foreach(discardCascade)
    undefine(pkgName)
  }

  def read(inst: Instance, logical: String): DataFrame =
    store.read(inst.table(logical))

  /** The live instance registered under `name`, if any — the lookup
    * `Students <- new StudentPackage.` global bindings resolve through
    * (HeroQL.compileWithPackages): a re-compiled program re-binds the
    * EXISTING instance rather than instantiating twice. */
  def instance(name: String): Option[Instance] = instances.get(name)

  /** The definition of `pkgName`, if defined (the table list a
    * package-instance global exposes as `Inst::Table` relations). */
  def definition(pkgName: String): Option[PackageDef] = packages.get(pkgName)
}
