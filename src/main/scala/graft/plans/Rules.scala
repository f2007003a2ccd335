package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Literal, Multiply, Pow}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Engine optimizer rules, injected via [[graft.GraftExtensions]]
  * (`injectOptimizerRule` — they run in the user-provided batch, after
  * constant folding has normalized literals).
  *
  * [[SquarePowRewrite]] enforces the engine's documented numeric
  * convention (SURVEY §2.8 / ops.Relational x_math): `pow(x, 2)` is
  * libm-dependent while `x * x` is a single IEEE multiply that every
  * engine computes identically — the form all graft queries use by
  * hand. The rule extends the convention to ad-hoc SQL automatically.
  * Verified semantics-preserving on this JVM: `Math.pow(x, 2)` was
  * bit-identical to `x * x` over 2·10⁶ random doubles including
  * subnormals (and `ExprProps` re-checks per build). Only DETERMINISTIC
  * bases are rewritten — duplicating a non-deterministic expression
  * (e.g. `pow(rand(), 2)`) would evaluate it twice and change results.
  */
object SquarePowRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Pow(x, Literal(2.0, DoubleType)) if x.deterministic =>
        Multiply(x, x)
    }
}
