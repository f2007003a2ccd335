package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** GraftExtensions: the SparkSessionExtensions injection path must make
  * every native function reachable from plain SQL in a session built
  * only from config — no library call. */
class ExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions=graft.GraftExtensions exposes the native functions to SQL") {
    val base = TestSpark.spark // ensures the shared SparkContext exists
    // getOrCreate returns the default session unless it's cleared; build
    // a genuinely new session (same context) so extensions apply, then
    // restore the default for every other suite. Never stop() it — that
    // would kill the shared context.
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // withExtensions: the config-string path
      // (spark.sql.extensions=graft.GraftExtensions, used by
      // Verify/Bench) only applies when the SparkContext itself is
      // created with it — this suite shares an already-running context,
      // so it exercises the programmatic form of the same entry point
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val r = s2.sql(
        """SELECT roll_hash('abc') AS h,
          |  sim_hash(array('a','b','c')) AS sh,
          |  vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
          |  sorted_intersect_count(array('a','b'), array('b','c')) AS i,
          |  sorted_long_intersect_count(array(1L,2L,3L), array(2L,3L,9L)) AS il,
          |  size(sign_lsh_keys(array(0.1D, -0.2D, 0.3D), 12, 6)) AS nk
          |""".stripMargin).head()
      assert(r.getLong(0) == TextHashKernels.rollingHash(UTF8String.fromString("abc")))
      assert(r.getLong(1) != 0L) // simhash of a non-empty token set
      assert(r.getDouble(2) == 11.0)
      assert(r.getInt(3) == 1)
      assert(r.getInt(4) == 2)
      assert(r.getInt(5) == 12)
      // identical expression tree as the Column-API path
      assert(r.getLong(0) ==
        base.range(1).select(TextHashes.rollHash(
          org.apache.spark.sql.functions.lit("abc"))).head().getLong(0))
      // literal-only geometry arguments fail loudly, not silently
      val err = intercept[Exception](
        s2.sql("SELECT sign_lsh_keys(array(1.0D), cast(rand()*3 AS INT), 6)").head())
      assert(err.getMessage.contains("literal"))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("injected optimizer rule rewrites pow(x,2) to x*x for deterministic bases only") {
    val base = TestSpark.spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val df = s2.sql("SELECT pow(id + 0.5, 2) AS p FROM range(5)")
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.toLowerCase.contains("pow("), s"pow should be rewritten:\n$plan")
      assert(plan.contains("*"), s"expected a multiply:\n$plan")
      assert(df.collect().map(_.getDouble(0)).toSeq ==
        (0 until 5).map(i => (i + 0.5) * (i + 0.5)))
      // non-deterministic base must NOT be duplicated
      val nd = s2.sql("SELECT pow(rand(), 2) AS p FROM range(1)")
        .queryExecution.optimizedPlan.toString
      assert(nd.toLowerCase.contains("pow("),
        s"pow(rand(),2) must stay a single evaluation:\n$nd")
      // bit-equality of the rewrite, re-checked per build
      val rnd = new scala.util.Random(7)
      (1 to 200000).foreach { _ =>
        val x = java.lang.Double.longBitsToDouble(rnd.nextLong())
        if (!x.isNaN && !x.isInfinite)
          assert(java.lang.Double.doubleToRawLongBits(math.pow(x, 2.0)) ==
            java.lang.Double.doubleToRawLongBits(x * x), s"x=$x")
      }
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
