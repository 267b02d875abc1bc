package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule (injected by [[graft.GraftExtensions]] via
  * `injectOptimizerRule`): rewrites the interpreted dot-product fold
  *
  *   aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, v) => acc + v)
  *
  * into the codegen'd [[DotProductExpr]] — so USER-written HOF dot
  * products (SQL `aggregate(zip_with(...))`, or the
  * [[graft.pipeline.Similarity.dotExpr]] spec form) get the native
  * kernel automatically, not just call sites that opted into
  * `Similarity.dot`.
  *
  * The substitution is semantics-preserving in every case, not just
  * the happy path: [[graft.functions.VectorKernel.dotOrNull]] returns
  * null exactly when the HOF form does (length mismatch -> zip_with
  * null-pads -> null product nulls the fold; null element likewise),
  * and accumulates left-to-right in the same order, so even the
  * floating-point bit pattern matches. Multiply/Add operand order is
  * accepted commuted — IEEE double `*` and `+` are commutative
  * (including NaN and signed-zero cases).
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def sameVar(e: Expression, v: NamedExpression): Boolean = (e, v) match {
    case (a: NamedLambdaVariable, b: NamedLambdaVariable) => a.exprId == b.exprId
    case _ => false
  }

  /** function is exactly (p, q) => p OP q over its own two lambda
    * params, in either operand order.
    */
  private def isBinOpOfParams(fn: LambdaFunction)(extract: Expression => Option[(Expression, Expression)]): Boolean =
    fn.arguments match {
      case Seq(p, q) =>
        extract(fn.function) match {
          case Some((l, r)) =>
            (sameVar(l, p) && sameVar(r, q)) || (sameVar(l, q) && sameVar(r, p))
          case None => false
        }
      case _ => false
    }

  private def isIdentity(fn: LambdaFunction): Boolean = fn.arguments match {
    case Seq(p) => sameVar(fn.function, p)
    case _ => false
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** The zero must be a foldable double evaluating to EXACTLY +0.0 —
    * a bit-pattern check, not value equality: a -0.0 zero would match
    * `== 0.0` but the HOF form returns -0.0 for empty arrays while
    * the kernel starts from +0.0. Foldable (not just bare-literal)
    * matching covers cast spellings like `CAST(0.0 AS DOUBLE)`
    * whenever they reach this rule unfolded (ADVICE r5). The BARE
    * `0.0` spelling is not a concern: its DECIMAL(1,1) accumulator
    * fails analysis against the double merge lambda, so it never
    * reaches the optimizer at all (pinned in PipelineSpec).
    */
  private def isPlusZeroDouble(zero: Expression): Boolean =
    zero.dataType == DoubleType && zero.foldable && {
      val v = try zero.eval() catch { case scala.util.control.NonFatal(_) => null }
      v != null && java.lang.Double.doubleToRawLongBits(v.asInstanceOf[Double]) == 0L
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case agg @ ArrayAggregate(zw: ZipWith, zero, merge: LambdaFunction, finish: LambdaFunction)
        if isPlusZeroDouble(zero) &&
          isDoubleArray(zw.left) && isDoubleArray(zw.right) &&
          (zw.function match {
            case lf: LambdaFunction =>
              isBinOpOfParams(lf) { case m: Multiply => Some((m.left, m.right)); case _ => None }
            case _ => false
          }) &&
          isBinOpOfParams(merge) { case a: Add => Some((a.left, a.right)); case _ => None } &&
          isIdentity(finish) =>
      logDebug(s"rewriting HOF dot-product fold to graft_dot: ${agg.sql}")
      DotProductExpr(zw.left, zw.right)
  }
}
