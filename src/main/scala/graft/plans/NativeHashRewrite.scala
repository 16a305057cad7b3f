package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayTransform, LambdaFunction, NamedLambdaVariable}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{PolyHash, PolyHashArray}

/** Optimizer rule: collapse the interpreted HOF form
  * `transform(arr, s -> graft_poly_hash(s, base, mod))` into the
  * whole-stage-codegen [[graft.functions.PolyHashArray]] expression.
  *
  * Spark's higher-order functions are `CodegenFallback` — the lambda is
  * interpreted per element — while the array expression generates one tight
  * Java loop. The rewrite fires only when the lambda body is EXACTLY a poly
  * hash of the lambda variable itself, so values are unchanged, including
  * per-element null propagation (PolyHashArray maps null → null like the
  * lambda form).
  *
  * Registered two ways, mirroring the function surface:
  *   - `spark.sql.extensions=graft.functions.GraftExtensions` →
  *     `injectOptimizerRule` (production path)
  *   - [[graft.functions.GraftFunctions.register]] →
  *     `spark.experimental.extraOptimizations` (live sessions)
  */
object NativeHashRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayTransform(arr,
          LambdaFunction(PolyHash(v: NamedLambdaVariable, base, mod), Seq(arg: NamedLambdaVariable), _))
          if v.exprId == arg.exprId =>
        PolyHashArray(arr, base, mod)
    }
}
