package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the COMPOSED vector folds — the
  * `aggregate(zip_with(...))` forms of [[graft.similarity.Similarity]]'s
  * cosine and squared-L2, which users naturally write with the public
  * DataFrame API — into the fused native expressions
  * ([[CosineSimilarity]], [[L2SquaredDistance]]).
  *
  * Why a Rule and not just "call the fused function": higher-order
  * functions run INTERPRETED — per element they dispatch a lambda and
  * the zip materializes an intermediate array, which measured 13×
  * slower than the fused loop inside the k-means assignment
  * (Similarity.l2sq scaladoc). A user composing `aggregate(zip_with)`
  * by hand, or SQL arriving from another tool in that shape, silently
  * pays that cost; with this rule injected (GraftExtensions /
  * GraftFunctions.register) the optimizer swaps in the fused kernel.
  * Legal because the fused expressions implement EXACTLY the
  * sequential-double-fold semantics of the composed trees — asserted
  * bit-for-bit in VectorExpressionsSpec — so this is a pure cost
  * rewrite, invisible to results and oracles.
  *
  * Deliberately conservative: only the exact shapes below rewrite
  * (float-array inputs, double casts, 0.0 seed, `acc + x` merge,
  * identity finish). Any other fold is left untouched.
  */
object FuseVectorFolds extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private object ToDouble {
    def unapply(e: Expression): Option[Expression] = e match {
      case c: Cast if c.dataType == DoubleType => Some(c.child)
      case _ => None
    }
  }

  private def isZeroSeed(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case _ => false
  }

  private def isSumMerge(f: Expression): Boolean = f match {
    case LambdaFunction(Add(l, r, _), Seq(acc, x), _) =>
      l.semanticEquals(acc) && r.semanticEquals(x)
    case _ => false
  }

  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(arg), _) => body.semanticEquals(arg)
    case _ => false
  }

  /** aggregate(zip_with(a, b, λ(x, y). body), 0.0, λ(acc, x). acc + x)
    * over two float-array columns → (a, b, body, λ-args).
    */
  private object VectorFold {
    def unapply(e: Expression)
        : Option[(Expression, Expression, Expression, Seq[NamedExpression])] =
      e match {
        case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(body, args, _)), zero, merge, finish)
            if isZeroSeed(zero) && isSumMerge(merge) &&
              isIdentityFinish(finish) && args.length == 2 &&
              isFloatArray(a) && isFloatArray(b) =>
          Some((a, b, body, args))
        case _ => None
      }
  }

  /** Element term of Similarity.dot: double(x) · double(y). */
  private def isDotBody(body: Expression, args: Seq[NamedExpression]): Boolean =
    body match {
      case Multiply(ToDouble(x), ToDouble(y), _) =>
        x.semanticEquals(args.head) && y.semanticEquals(args(1))
      case _ => false
    }

  /** Element term of Similarity.l2sqComposed: (double(x) − double(y))². */
  private def isL2Body(body: Expression, args: Seq[NamedExpression]): Boolean =
    body match {
      case Multiply(s1 @ Subtract(ToDouble(x), ToDouble(y), _), s2, _) =>
        s1.semanticEquals(s2) &&
          x.semanticEquals(args.head) && y.semanticEquals(args(1))
      case _ => false
    }

  private object DotFold {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case VectorFold(a, b, body, args) if isDotBody(body, args) => Some((a, b))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // cosineComposed: dot(a,b) / (sqrt(dot(a,a)) · sqrt(dot(b,b))).
    // Matched top-down, so the whole tree fuses before the inner dot
    // folds could be visited on their own.
    case Divide(DotFold(a, b),
        Multiply(Sqrt(DotFold(a2, a3)), Sqrt(DotFold(b2, b3)), _), _)
        if a.semanticEquals(a2) && a.semanticEquals(a3) &&
          b.semanticEquals(b2) && b.semanticEquals(b3) =>
      CosineSimilarity(a, b)
    case VectorFold(a, b, body, args) if isL2Body(body, args) =>
      L2SquaredDistance(a, b)
  }
}
