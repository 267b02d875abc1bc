package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.plans.{DotProductExpr, MinhashSignatureExpr, ShinglesExpr, SimhashBitsExpr}

/** SparkSessionExtensions entry point: exposes the native
  * expressions to the SQL surface as `graft_minhash(arr, n)`,
  * `graft_shingles(words, n)`, `graft_simhash(words, bits)`,
  * `graft_dot(a, b)` (double or int8-code array sides), and
  * `graft_int8(vec)`, and injects
  * the [[graft.plans.RewriteDotProduct]] optimizer rule (HOF
  * dot-product folds auto-upgrade to the native kernel). Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (or
  * `builder.withExtensions(new GraftExtensions)`); Column-level use
  * of the expressions needs no registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Constant-fold an integral argument: accepts a bare int literal,
    * any foldable expression evaluating to an integral (so
    * `CAST(8 AS INT)`, `8L`, `4 + 4` all work — ADVICE r5), rejects
    * everything else with a clear message.
    */
  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case _ if e.foldable =>
      (try e.eval() catch {
        case scala.util.control.NonFatal(_) => null
      }) match {
        case i: java.lang.Integer => i.intValue
        case l: java.lang.Long if l.longValue.isValidInt => l.intValue
        case s: java.lang.Short => s.intValue
        case b: java.lang.Byte => b.intValue
        case other => throw new IllegalArgumentException(
          s"$what must fold to an integral literal, got $other from $e")
      }
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // auto-upgrade user-written HOF dot-product folds to the native
    // kernel (strictly semantics-preserving — see RewriteDotProduct)
    ext.injectOptimizerRule(_ => graft.plans.RewriteDotProduct)
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinhashSignatureExpr].getName, "graft_minhash"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_minhash(shingles, numHashes) takes 2 arguments")
        MinhashSignatureExpr(args.head, intLit(args(1), "numHashes"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShinglesExpr].getName, "graft_shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_shingles(words, n) takes 2 arguments")
        ShinglesExpr(args.head, intLit(args(1), "n"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot(a, b) takes 2 arguments")
        DotProductExpr(args.head, args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimhashBitsExpr].getName, "graft_simhash"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_simhash(words, bits) takes 2 arguments")
        SimhashBitsExpr(args.head, intLit(args(1), "bits"))
      }))
    // graft_int8(vec) -> struct(codes array<int>, scale): the fused
    // quantizer on the SQL surface, same as its Column-level face
    ext.injectFunction((
      new FunctionIdentifier("graft_int8"),
      new ExpressionInfo(classOf[graft.plans.Int8QuantizeExpr].getName, "graft_int8"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_int8(vec) takes 1 argument")
        graft.plans.Int8QuantizeExpr(args.head)
      }))
    // graft_approx_quantiles(value, array(p1, p2, ...), alpha):
    // the DDSketch aggregate from SQL — ps/alpha must fold to literals
    ext.injectFunction((
      new FunctionIdentifier("graft_approx_quantiles"),
      new ExpressionInfo(classOf[graft.plans.DDSketchQuantiles].getName, "graft_approx_quantiles"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "graft_approx_quantiles(value, ps, alpha) takes 3 arguments")
        require(args(1).foldable && args(2).foldable,
          "ps and alpha must be literals")
        // fold through a Cast to double so ordinary SQL numeric
        // literals bind: a plain `array(0.25, 0.5)` / `0.01` parses
        // as DECIMAL, and `0.5E0` as double — both must work
        val ps = org.apache.spark.sql.catalyst.expressions
          .Cast(args(1), org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)).eval() match {
          case a: org.apache.spark.sql.catalyst.util.ArrayData =>
            a.toDoubleArray().toSeq
          case other => throw new IllegalArgumentException(
            s"ps must fold to an array of doubles, got $other")
        }
        val alpha = org.apache.spark.sql.catalyst.expressions
          .Cast(args(2), org.apache.spark.sql.types.DoubleType).eval() match {
          case d: java.lang.Double => d.doubleValue
          case other => throw new IllegalArgumentException(
            s"alpha must fold to a double literal, got $other")
        }
        graft.plans.DDSketchQuantiles(args.head, ps, alpha)
      }))
  }
}
