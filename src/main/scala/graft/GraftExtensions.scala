package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._

/** Session-extension entry point: injects every native graft Catalyst
  * expression as a SQL function at session build time —
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions       // cluster conf
  *   SparkSession.builder().withExtensions(new GraftExtensions)  // code
  * }}}
  *
  * This is the deployment-grade registration path: the functions exist
  * in EVERY session derived from the config (thriftserver, notebooks,
  * `spark.newSession()`), not just after a library call — which is what
  * lets plain-SQL users reach `roll_hash`/`sim_hash`/`vec_dot` without
  * touching the Scala API. The runtime
  * [[graft.functions.TextHashes.register]] path stays for sessions
  * built without the config (both are idempotent; same expressions
  * either way).
  *
  * All injected builders construct the same codegen'd expressions the
  * Column API uses — `expr("roll_hash(text)")` and
  * `TextHashes.rollHash(col("text"))` produce identical plans.
  * `sign_lsh_keys`'s table-geometry arguments must be literals (they
  * parameterize generated code, not per-row inputs).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def inject(ext: SparkSessionExtensions, name: String,
      builder: Seq[Expression] => Expression): Unit =
    ext.injectFunction((FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))

  private def litInt(e: Expression, what: String): Int = e match {
    case f if f.foldable => f.eval().asInstanceOf[Number].intValue
    case other => throw new IllegalArgumentException(
      s"$what must be a literal int, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // optimizer rule: engine numeric convention pow(x,2) → x·x
    // (graft.plans.SquarePowRewrite — deterministic bases only)
    ext.injectOptimizerRule(_ => graft.plans.SquarePowRewrite)
    // planner strategy: whole-operator as-of join (graft.plans.AsofJoin)
    ext.injectPlannerStrategy(_ => graft.plans.AsofStrategy)
    inject(ext, "roll_hash", es => RollingHash(es.head))
    inject(ext, "sim_hash", es => SimHash(es.head))
    inject(ext, "vec_dot", es => VecDot(es(0), es(1)))
    inject(ext, "sorted_intersect_count", es => SortedIntersectCount(es(0), es(1)))
    inject(ext, "sorted_long_intersect_count", es => SortedLongIntersectCount(es(0), es(1)))
    inject(ext, "sign_lsh_keys", es => SignLshKeys(es(0),
      litInt(es(1), "nTables"), litInt(es(2), "planesPerTable")))
  }
}
