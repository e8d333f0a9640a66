package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Scalar kernels shared by interpreted eval and generated code. Top-level
  * object methods compile to static forwarders, so whole-stage codegen can
  * call them directly (the same pattern Spark's own regexp/url expressions
  * use for their heavy kernels).
  */
object Kernels {

  /** F1 SSN normalization (reference src/core/normalizers.py:59-101):
    * strip a trailing ".0" float artifact, drop non-digits, left-pad to 9;
    * null when empty or longer than 9 digits. Single pass, no regex.
    */
  def normalizeSsn(input: UTF8String): UTF8String = {
    val s = input.toString.trim
    val defloated =
      if (s.endsWith(".0") && s.length > 2 && isAllDigits(s, 0, s.length - 2))
        s.substring(0, s.length - 2)
      else s
    val sb = new java.lang.StringBuilder(defloated.length)
    var i = 0
    while (i < defloated.length) {
      val c = defloated.charAt(i)
      if (c >= '0' && c <= '9') sb.append(c)
      i += 1
    }
    val n = sb.length
    if (n == 0 || n > 9) null
    else {
      val out = new java.lang.StringBuilder(9)
      var p = n
      while (p < 9) { out.append('0'); p += 1 }
      out.append(sb)
      UTF8String.fromString(out.toString)
    }
  }

  /** Sequential-order dot product of two numeric arrays in double
    * precision: acc = acc + (double)a[i] * (double)b[i], i ascending —
    * the same IEEE operation order as the
    * `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, +)` higher-order
    * fold (and DuckDB's list_reduce twin), so results are bit-identical,
    * at a fraction of the cost: HOF lambdas are evaluated interpreted
    * with per-element allocation, this is a primitive loop inside
    * whole-stage codegen. Exactly mirrors the zip_with+fold null
    * semantics: unequal lengths null the result (zip_with pads the short
    * side with nulls, and a null product nulls the running sum), as does
    * a null element. Returns a boxed Double (null marker) for codegen
    * simplicity.
    */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  private def isAllDigits(s: String, from: Int, until: Int): Boolean = {
    var i = from
    while (i < until) {
      val c = s.charAt(i)
      if (c < '0' || c > '9') return false
      i += 1
    }
    i > from
  }

  /** Polynomial rolling hash over code points, mod 1e9+7 — the tight-loop
    * kernel behind the TDP shingle hashing (same value as the
    * `aggregate(transform(sequence(...)))` higher-order-function fold, at a
    * fraction of the per-row cost).
    */
  def polyHash(input: UTF8String): Long = {
    val s = input.toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }
}

/** Native Catalyst expression for F1 SSN normalization: codegen emits a
  * direct static call, so the operator stays inside whole-stage codegen
  * (no UDF boundary, no serialization).
  */
case class NormalizeSsnExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_normalize_ssn"

  override def nullSafeEval(input: Any): Any =
    Kernels.normalizeSsn(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.Kernels.normalizeSsn($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): NormalizeSsnExpr =
    copy(child = newChild)
}

/** Native Catalyst expression for the polynomial rolling hash. */
case class PolyHashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  override def nullSafeEval(input: Any): Any =
    Kernels.polyHash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Kernels.polyHash($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHashExpr =
    copy(child = newChild)
}

/** Native Catalyst expression for the double-precision array dot product
  * (see [[Kernels.dot]] for the exact fold semantics). Drives the
  * similarity-search family: embedding norms, cosine top-k, IVF
  * assignment/search, LSH plane signatures, and near-dup thresholds.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(et @ (FloatType | DoubleType), _) => Some(et)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left.dataType), elemType(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two float/double array arguments, got " +
          s"${left.dataType} and ${right.dataType}")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  private lazy val leftFloat = elemType(left.dataType).contains(FloatType)
  private lazy val rightFloat = elemType(right.dataType).contains(FloatType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = Kernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftFloat, rightFloat)
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_boxed =
        graft.expressions.Kernels.dot($a, $b, $leftFloat, $rightFloat);
      if (${ev.value}_boxed == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}_boxed.doubleValue();
      }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

/** Session extension registering the native expressions as SQL functions
  * (usable inside higher-order-function lambdas). Install either via
  * `spark.sql.extensions=graft.expressions.GraftExtensions` or
  * programmatically with [[GraftExtensions.registerAll]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.RewriteDotProduct)
    ext.injectOptimizerRule(_ => graft.plans.RewriteRangeJoin)
    ext.injectPlannerStrategy(_ => graft.plans.RangeJoinStrategy)
  }
}

object GraftExtensions {

  /** Registry entry with a uniform arity check so a wrong-arity call
    * fails analysis with a clear message instead of an
    * IndexOutOfBoundsException from the builder body.
    */
  private def entry(name: String, clazz: Class[_], arity: Int)(
      build: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name),
      (exprs: Seq[Expression]) => {
        require(exprs.length == arity,
          s"$name takes $arity argument(s), got ${exprs.length}")
        build(exprs)
      })

  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    entry("graft_normalize_ssn", classOf[NormalizeSsnExpr], 1)(
      exprs => NormalizeSsnExpr(exprs.head)),
    entry("graft_polyhash", classOf[PolyHashExpr], 1)(
      exprs => PolyHashExpr(exprs.head)),
    entry("graft_dot", classOf[DotProductExpr], 2)(
      exprs => DotProductExpr(exprs(0), exprs(1))),
    entry("graft_bottomk", classOf[BottomKAgg], 2)(
      exprs => BottomKAgg(exprs(0), exprs(1))),
    entry("graft_bloom_agg", classOf[BloomBuildAgg], 3)(
      exprs => BloomBuildAgg(exprs(0), exprs(1), exprs(2))),
    entry("graft_bloom_contains", classOf[BloomMightContainExpr], 2)(
      exprs => BloomMightContainExpr(exprs(0), exprs(1))),
    entry("graft_cms_agg", classOf[CountMinBuildAgg], 2)(
      exprs => CountMinBuildAgg(exprs(0), exprs(1))),
    entry("graft_cms_estimate", classOf[CountMinEstimateExpr], 2)(
      exprs => CountMinEstimateExpr(exprs(0), exprs(1))),
    entry("graft_ss_agg", classOf[SpaceSavingAgg], 2)(
      exprs => SpaceSavingAgg(exprs(0), exprs(1))),
    entry("graft_hll_agg", classOf[HllBuildAgg], 1)(
      exprs => HllBuildAgg(exprs.head)),
    entry("graft_hll_estimate", classOf[HllEstimateExpr], 1)(
      exprs => HllEstimateExpr(exprs.head)),
    entry("graft_cms_dot", classOf[CountMinDotExpr], 2)(
      exprs => CountMinDotExpr(exprs(0), exprs(1))),
    entry("graft_topn", classOf[TopNAgg], 3)(
      exprs => TopNAgg(exprs(0), exprs(1), exprs(2))))

  /** Idempotent per-session registration (for sessions built without the
    * extensions config, e.g. the driver-owned Verify/Bench sessions):
    * native functions plus the dot-product rewrite rule.
    */
  def registerAll(spark: SparkSession): Unit = {
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(graft.plans.RewriteDotProduct))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RewriteDotProduct
    if (!spark.experimental.extraOptimizations.contains(graft.plans.RewriteRangeJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RewriteRangeJoin
    graft.plans.NativeRangeJoin.register(spark)
  }
}
