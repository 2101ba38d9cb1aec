package graft

import org.apache.spark.sql.SparkSession

/** The `spark.sql.extensions=graft.GraftExtensions` plug-in path must
  * make every native function resolvable in a fresh session with no
  * driver-side registration call — and agree exactly with the
  * session-local `VectorFns.register` path. */
class ExtensionsSpec extends SparkSpec {

  test("extensions entry point injects the native functions, matching register()") {
    val orig = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // fresh session on the same SparkContext; extensions apply at
      // build (withExtensions — the spark.sql.extensions STRING form is
      // a static conf, fixed at SparkContext creation, so it can't be
      // exercised from inside an already-running test context; both
      // routes call the same GraftExtensions.apply)
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s2 ne orig, "must be a new session or extensions won't apply")
      val viaExt = s2.sql(
        "SELECT graft_simhash31(graft_token_polyhash(array('alpha', 'beta'))) AS h")
        .head().getLong(0)
      graft.functions.VectorFns.register(orig)
      val viaReg = orig.sql(
        "SELECT graft_simhash31(graft_token_polyhash(array('alpha', 'beta'))) AS h")
        .head().getLong(0)
      assert(viaExt == viaReg, "extension-injected function disagrees with register()")
      // default minhash family (63 = dd3's 21 bands x 3 rows) is injected
      val k = s2.sql(
        "SELECT size(graft_minhash_sig_long(graft_shingle_hashes('the quick brown fox jumps', 5))) AS k")
        .head().getInt(0)
      assert(k == 63, s"expected the 63-hash default signature, got $k")
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  test("extensions inject the conf-driven MV rewrite (no-op until the root is set)") {
    val orig = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val st = new graft.store.TableStore(s2,
        java.nio.file.Files.createTempDirectory("graft-ext-mvrw-").toString)
      import org.apache.spark.sql.functions._
      val base = s2.read.parquet(s"$sf/lineitem.parquet").select(
        col("l_returnflag"),
        expr("CAST(l_quantity AS BIGINT)").as("qty"))
      st.create("facts", base)
      graft.store.MaterializedView.register(st, "facts_view", "facts",
        graft.store.MaterializedView.MvDef(Seq("l_returnflag"),
          Seq("sum_qty" -> "qty")))
      def agg() = st.read("facts").groupBy("l_returnflag")
        .agg(sum("qty").as("s"))
      def scans(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation.asInstanceOf[
              org.apache.spark.sql.execution.datasources.HadoopFsRelation]
              .location.rootPaths.map(_.toUri.getPath)
        }.flatten
      // conf unset → the injected rule is a no-op
      assert(!scans(agg()).exists(_.contains("/facts_view/")),
        "rewrite must stay off until spark.graft.store.root is set")
      s2.conf.set("spark.graft.store.root", st.root)
      try {
        val rewritten = agg()
        assert(scans(rewritten).forall(_.contains("/facts_view/")),
          "conf-driven rewrite did not engage:\n" +
            rewritten.queryExecution.optimizedPlan.treeString)
        assert(rewritten.collect().map(_.getLong(1)).sum ==
          base.agg(sum("qty")).head.getLong(0))
      } finally s2.conf.unset("spark.graft.store.root")
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }
}
