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
}
