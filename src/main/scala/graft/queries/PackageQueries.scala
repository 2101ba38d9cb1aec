package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.store.{PackageDef, PackageManager, TableStore}

/** Package / instance lifecycle (`Kernel/README.md:256-273`,
  * `Kernel/Drafts/draft:168-197`) made oracle-checkable: each query
  * drives define → instantiate → (inherit → mutate → merge | isolate)
  * through [[graft.store.PackageManager]]'s atomic-commit paths and
  * returns a final committed state the DuckDB oracle states relationally
  * from the same base tables.
  */
object PackageQueries extends QueryPack {

  private val custCols = Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal")

  private def seedDf(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer").filter(col("c_custkey") % 5 === 0)
      .select(custCols.map(col): _*)

  private def mgr(s: SparkSession): PackageManager =
    new PackageManager(new TableStore(s,
      Files.createTempDirectory("graft-pkg-").toString))

  /** pk1 — inherit (manifest pointer-copy), mutate the CHILD
    * copy-on-write, check the PARENT is untouched, then merge the child
    * back (one atomic multi-table swap) and emit the parent's final
    * state. */
  private def pk1(s: SparkSession, d: String): DataFrame = {
    val pm = mgr(s)
    pm.define(PackageDef("crm", tables = Seq("customer")))
    val base = pm.instantiate("crm", "prod", Map("customer" -> seedDf(s, d)))
    val fork = pm.instantiateInheriting(base, "staging")
    // child mutations: credit nation<10 balances, remove negative ones
    pm.store.update(fork.table("customer"),
      Map("c_acctbal" -> (col("c_acctbal") + 100.0)), col("c_nationkey") < 10)
    pm.store.delete(fork.table("customer"), col("c_acctbal") < 0.0)
    // parent must still serve the pre-fork snapshot (COW isolation):
    // fail loudly inside the query if inheritance leaked
    val parentN = pm.read(base, "customer").count()
    val seedN = seedDf(s, d).count()
    require(parentN == seedN, s"COW leak: parent $parentN != seed $seedN")
    pm.merge(fork)
    pm.read(base, "customer")
  }

  /** pk2 — two INDEPENDENT instances of one package in the same module:
    * mutations in one are invisible in the other; emit both namespaces
    * tagged. */
  private def pk2(s: SparkSession, d: String): DataFrame = {
    val pm = mgr(s)
    pm.define(PackageDef("crm", tables = Seq("customer")))
    val a = pm.instantiate("crm", "tenant_a", Map("customer" -> seedDf(s, d)))
    val b = pm.instantiate("crm", "tenant_b", Map("customer" -> seedDf(s, d)))
    pm.store.update(a.table("customer"),
      Map("c_acctbal" -> lit(0.0)), lit(true))
    pm.read(a, "customer").withColumn("tenant", lit("tenant_a"))
      .unionByName(pm.read(b, "customer").withColumn("tenant", lit("tenant_b")))
  }

  /** The `package NAME using ...; public query` DECLARATION text
    * (`Kernel/README.md:256-264`), parsed and registered through
    * [[graft.heroql.HeroQL.definePackage]]. `BigSpenders` is the public
    * surface; `Ledger` stays package-private (PackagesSpec proves the
    * visibility wall). */
  private val crmPackage = """
package crm;

data Customers(ck: int64, name: string, nation: int64, bal: double).

public query BigSpenders(ck: int64, name: string) -> (bal: double)
:-  Customers(ck, name, nation, bal),
    bal > 5000.0
.

query Ledger(ck: int64) -> (bal: double)
:-  Customers(ck, _, _, bal)
.
"""

  private val reportsPackage = """
package reports using crm;
data Empty(x: int64).
"""

  /** pk3 — package + public query declared in HeroQL TEXT: define crm
    * and a `using` consumer, instantiate crm with seed data, and compile
    * the public query from the consumer package (visibility enforced by
    * the manager). */
  private def pk3(s: SparkSession, d: String): DataFrame = {
    val pm = mgr(s)
    graft.heroql.HeroQL.definePackage(crmPackage, pm)
    graft.heroql.HeroQL.definePackage(reportsPackage, pm)
    val seed = seedDf(s, d).select(
      col("c_custkey").as("ck"), col("c_name").as("name"),
      col("c_nationkey").as("nation"), col("c_acctbal").as("bal"))
    val inst = pm.instantiate("crm", "prod", Map("Customers" -> seed))
    graft.heroql.HeroQL.compilePackaged(crmPackage, "BigSpenders", "reports", pm)(inst)
  }

  /** pk4 — cascade-delete ordering (`Kernel/README.md:14` "deleted as
    * a whole operation, which require all other packages that depend
    * on it are deleted"): with `reports using crm` and a live
    * crm instance chain (prod ← staging), every out-of-order delete
    * must refuse — undefine(crm) while reports exists, undefine after
    * reports leaves while instances live, discard(prod) while staging
    * inherits — and deleteCascade must then take everything down in
    * dependency order. The emitted frame is the archive instance's
    * table, proving the cascade touched ONLY the crm world: its
    * content is the staging fork's final mutated state, merged out
    * before the delete. */
  private def pk4(s: SparkSession, d: String): DataFrame = {
    val pm = mgr(s)
    pm.define(PackageDef("crm", tables = Seq("customer")))
    pm.define(PackageDef("reports", tables = Seq("archive"), using = Seq("crm")))
    val prod = pm.instantiate("crm", "prod", Map("customer" -> seedDf(s, d)))
    val staging = pm.instantiateInheriting(prod, "staging")
    pm.store.update(staging.table("customer"),
      Map("c_acctbal" -> (col("c_acctbal") + 100.0)), col("c_nationkey") < 10)
    val rep = pm.instantiate("reports", "rep",
      Map("archive" -> pm.read(staging, "customer")))
    // pin the archive BEFORE the deletes: the emitted frame must be the
    // pre-cascade snapshot, independent of what unpublish does next
    val archive = pm.read(rep, "archive").localCheckpoint()
    def mustRefuse(what: String)(f: => Unit): Unit =
      try { f; throw new IllegalArgumentException(s"$what must refuse") }
      catch { case _: IllegalStateException => () }
    mustRefuse("undefine(crm) with dependent reports")(pm.undefine("crm"))
    mustRefuse("discard(prod) with inheriting staging")(pm.discard(prod))
    pm.deleteCascade("reports") // rep instance + definition leave
    mustRefuse("undefine(crm) with live instances")(pm.undefine("crm"))
    pm.deleteCascade("crm") // staging before prod, then the definition
    require(pm.dependentsOf("crm").isEmpty)
    require(!pm.store.exists(prod.table("customer")) &&
      !pm.store.exists(staging.table("customer")) &&
      !pm.store.exists(rep.table("archive")),
      "cascade must unpublish the whole dependent world")
    archive
  }

  /** hq30 — GLOBAL READONLY VALUES as HeroQL text, both reference
    * forms in one program (`Kernel/README.md:247-249`): `MinBal <-
    * 2000.0 + 2000.0.` (a constant, folded at parse and substituted
    * into the rule body wherever not locally bound) and `Students <-
    * new crm.` (a package-instance binding — the instance's relations
    * are addressed `Students::Customers(...)`; here the name re-binds
    * the module's existing seeded instance, the declaration-not-
    * command semantics [[graft.heroql.HeroQL.compileWithPackages]]
    * pins; PackagesSpec drives the instantiate-on-first-compile path
    * and the reserved-name diagnostics). */
  private val hq30Program = """
MinBal <- 2000.0 + 2000.0.
Students <- new crm.

query Rich(ck: int64, name: string) -> (bal: double)
:-  Students::Customers(ck, name, _, bal),
    bal > MinBal
.
"""

  private def hq30(s: SparkSession, d: String): DataFrame = {
    val pm = mgr(s)
    graft.heroql.HeroQL.definePackage(crmPackage, pm)
    val seed = seedDf(s, d).select(
      col("c_custkey").as("ck"), col("c_name").as("name"),
      col("c_nationkey").as("nation"), col("c_acctbal").as("bal"))
    pm.instantiate("crm", "Students", Map("Customers" -> seed))
    graft.heroql.HeroQL.compileWithPackages(hq30Program, "Rich", Map.empty, pm)
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pk1_package_inherit_merge" -> (pk1 _),
    "pk2_package_isolation" -> (pk2 _),
    "pk3_package_decl" -> (pk3 _),
    "pk4_package_cascade_delete" -> (pk4 _),
    "hq30_global_values" -> (hq30 _),
  )

  private val seedSql =
    "SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM customer WHERE c_custkey % 5 = 0"

  override val oracles: Map[String, String] = Map(
    "pk1_package_inherit_merge" ->
      s"""SELECT c_custkey, c_name, c_nationkey,
                 CASE WHEN c_nationkey < 10 THEN c_acctbal + 100.0
                      ELSE c_acctbal END AS c_acctbal
          FROM ($seedSql)
          WHERE (CASE WHEN c_nationkey < 10 THEN c_acctbal + 100.0
                      ELSE c_acctbal END) >= 0.0""",
    "pk2_package_isolation" ->
      s"""SELECT c_custkey, c_name, c_nationkey, 0.0 AS c_acctbal,
                 'tenant_a' AS tenant FROM ($seedSql)
          UNION ALL
          SELECT c_custkey, c_name, c_nationkey, c_acctbal,
                 'tenant_b' AS tenant FROM ($seedSql)""",
    "pk3_package_decl" ->
      s"""SELECT c_custkey AS ck, c_name AS name, c_acctbal AS bal
          FROM ($seedSql) WHERE c_acctbal > 5000.0""",
    // MinBal folds to 4000.0 at parse; the instance table is the seed
    "hq30_global_values" ->
      s"""SELECT c_custkey AS ck, c_name AS name, c_acctbal AS bal
          FROM ($seedSql) WHERE c_acctbal > 4000.0""",
    // the staging fork's mutated state, archived into reports before
    // the ordered cascade deletes both packages
    "pk4_package_cascade_delete" ->
      s"""SELECT c_custkey, c_name, c_nationkey,
                 CASE WHEN c_nationkey < 10 THEN c_acctbal + 100.0
                      ELSE c_acctbal END AS c_acctbal
          FROM ($seedSql)""",
  )
}
