package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.expressions.DotProductExpr

/** Optimizer rule that recognizes the declarative dot-product pattern
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
  *               CAST(0 AS DOUBLE), (acc, x) -> acc + x) }}}
  *
  * and replaces it with the codegen'd [[DotProductExpr]] kernel. Users can
  * keep writing the idiomatic higher-order-function form (the one the
  * Spark API naturally suggests for embedding math) and still get the
  * primitive-loop kernel: HOF lambdas are evaluated interpreted with
  * per-element allocation, roughly an order of magnitude slower per row.
  *
  * The rewrite fires only when it is bit-for-bit semantics-preserving:
  *   - both sides are float/double arrays (the product is a double, so the
  *     fold is a pure double accumulation in element order — exactly what
  *     the kernel computes);
  *   - the zero literal is double +0.0 (a -0.0 seed can surface as -0.0
  *     where the kernel yields +0.0);
  *   - the merge lambda is literally `acc + elem` and the finish lambda is
  *     the identity;
  *   - each multiplicand is the corresponding lambda variable, optionally
  *     under a cast to double.
  * Null semantics are preserved by construction: unequal lengths and null
  * elements null the kernel's result just as the padded zip_with fold
  * nulls the running sum.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isNumericArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  /** The lambda variable behind `x` or `CAST(x AS DOUBLE)`. */
  private def boundVar(e: Expression): Option[NamedLambdaVariable] = e match {
    case v: NamedLambdaVariable => Some(v)
    case Cast(v: NamedLambdaVariable, DoubleType, _, _) => Some(v)
    case _ => None
  }

  private def isPlusZero(e: Expression): Boolean = e match {
    case Literal(v: Double, DoubleType) =>
      java.lang.Double.doubleToRawLongBits(v) == 0L
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(left, right,
          LambdaFunction(Multiply(mx, my, _),
            Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
        zero,
        LambdaFunction(Add(aref: NamedLambdaVariable, eref: NamedLambdaVariable, _),
          Seq(acc: NamedLambdaVariable, elem: NamedLambdaVariable), _),
        LambdaFunction(fref: NamedLambdaVariable, Seq(fv: NamedLambdaVariable), _))
        if isPlusZero(zero) &&
          isNumericArray(left) && isNumericArray(right) &&
          boundVar(mx).exists(_.exprId == x.exprId) &&
          boundVar(my).exists(_.exprId == y.exprId) &&
          aref.exprId == acc.exprId && eref.exprId == elem.exprId &&
          fref.exprId == fv.exprId =>
      DotProductExpr(left, right)
  }
}
