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

  /** Exact integer squared-L2 distance over two bigint arrays —
    * value-identical to
    * `aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L,
    * (acc, v) -> acc + v)` including its null semantics (unequal lengths
    * null the result via zip_with's null padding; a null element nulls
    * the running sum), with the same wrapping two's-complement long
    * arithmetic the SQL fold performs (ANSI off). One native pass
    * instead of three interpreted lambdas per pair (r15; guide §4 —
    * the dbscan-family verify bill).
    */
  def l2sq(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
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
  def polyHash(input: UTF8String): Long = polyHashString(input.toString)

  private def polyHashString(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  /** Whitespace tokenization, value-identical to
    * `filter(split(text, '\\s+'), x -> x != '')`: maximal runs of
    * non-whitespace characters, where whitespace is exactly Java regex
    * `\s` = [ \t\n\x0B\f\r]. One native pass instead of a regex split
    * allocating the empty boundary tokens plus an interpreted filter
    * lambda over every token.
    */
  def wsTokens(input: UTF8String): ArrayData = {
    val s = input.toString
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(s.charAt(i))) i += 1
      if (i > start) out.add(UTF8String.fromString(s.substring(start, i)))
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray.asInstanceOf[Array[Any]])
  }

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  private val EmptyLongArray =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])

  def emptyLongArray(): ArrayData = EmptyLongArray

  /** Distinct word-3-gram shingle polyhashes in first-occurrence order —
    * value-identical to hashing
    * `array_distinct(transform(sequence(1, size(toks) - 2), i ->
    * concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])))` with
    * [[polyHash]], fused into one native pass (dedup stays on the
    * shingle STRING, exactly like array_distinct, so hash collisions
    * between distinct shingles still emit both hashes).
    */
  def shingleHashes(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n < 3) return EmptyLongArray
    val seen = new java.util.LinkedHashSet[String]()
    val words = new Array[String](n)
    var i = 0
    while (i < n) { words(i) = toks.getUTF8String(i).toString; i += 1 }
    i = 0
    while (i < n - 2) {
      val sb = new java.lang.StringBuilder(
        words(i).length + words(i + 1).length + words(i + 2).length + 2)
      sb.append(words(i)).append(' ')
        .append(words(i + 1)).append(' ').append(words(i + 2))
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Long](seen.size)
    var j = 0
    val it = seen.iterator()
    while (it.hasNext) { out(j) = polyHashString(it.next()); j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Overlapping w-token window polyhashes — value-identical to
    * `transform(sequence(1, size(toks) - w + 1), i ->
    * polyHash(concat_ws(' ', slice(toks, i, w))))` (with the
    * size(toks) >= w CASE guard), fused into one native pass: the hash
    * runs straight over the window's word chars with the single-space
    * separators injected, no slice copy, no joined-string allocation,
    * no interpreted lambda. Fewer than w tokens (or a null array, via
    * the expression wrapper) yields an empty array.
    */
  def spanHashes(toks: ArrayData, w: Int): ArrayData = {
    val n = toks.numElements()
    if (n < w) return EmptyLongArray
    val words = new Array[String](n)
    var i = 0
    while (i < n) { words(i) = toks.getUTF8String(i).toString; i += 1 }
    val out = new Array[Long](n - w + 1)
    i = 0
    while (i <= n - w) {
      var acc = 0L
      var j = i
      while (j < i + w) {
        if (j > i) acc = (acc * 31 + ' '.toInt) % 1000000007L
        val s = words(j)
        var k = 0
        while (k < s.length) {
          val cp = s.codePointAt(k)
          acc = (acc * 31 + cp) % 1000000007L
          k += Character.charCount(cp)
        }
        j += 1
      }
      out(i) = acc
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Count of distinct common elements of two bigint arrays —
    * value-identical to `size(array_intersect(a, b))` on null-free
    * arrays (array_intersect returns the DISTINCT elements of `a` that
    * occur in `b`; the sort-merge skips duplicate runs on both sides),
    * without materializing the intersection array or boxing a hash set.
    */
  def intersectCount(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0 || m == 0) return 0L
    val aa = a.toLongArray()
    val bb = b.toLongArray()
    java.util.Arrays.sort(aa)
    java.util.Arrays.sort(bb)
    var i = 0
    var j = 0
    var c = 0L
    while (i < n && j < m) {
      val x = aa(i)
      val y = bb(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else {
        c += 1
        while (i < n && aa(i) == x) i += 1
        while (j < m && bb(j) == x) j += 1
      }
    }
    c
  }

  /** k-permutation MinHash minima in ONE pass over the hash array —
    * value-identical to k separate
    * `array_min(transform(hashes, h -> (h * a_j + b_j) % p))`
    * higher-order folds (empty input yields k null minima, matching
    * array_min of an empty array), without k interpreted per-element
    * lambda walks.
    */
  def minhashMins(hashes: ArrayData, a: Array[Long], b: Array[Long], p: Long): ArrayData = {
    val k = a.length
    val n = hashes.numElements()
    if (n == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        new Array[Any](k))
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < k) {
        val v = (h * a(j) + b(j)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
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

/** Native integer squared-L2 distance (see [[Kernels.l2sq]]) — the
  * dbscan-family pair verify; replaces the interpreted
  * `aggregate(zip_with(...))` fold while preserving its exact value and
  * null semantics.
  */
case class L2SqExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"${left.dataType} and ${right.dataType}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_l2sq"

  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Long ${ev.value}_boxed = graft.expressions.Kernels.l2sq($a, $b);
      if (${ev.value}_boxed == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}_boxed.longValue();
      }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2SqExpr =
    copy(left = newLeft, right = newRight)
}

/** Native whitespace tokenizer (see [[Kernels.wsTokens]]) — the corpus
  * tokenization underlying every TDP text frame; replaces the regex
  * split + interpreted filter lambda while preserving its exact value.
  */
case class WsTokensExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_ws_tokens"

  override def nullSafeEval(input: Any): Any =
    Kernels.wsTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Kernels.wsTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): WsTokensExpr =
    copy(child = newChild)
}

/** Native fused distinct-3-gram-shingle polyhasher (see
  * [[Kernels.shingleHashes]]). NOT null-safe by design: a null token
  * array yields an EMPTY hash array, mirroring the
  * `CASE WHEN size(toks) >= 3 THEN ... ELSE array() END` wrapper it
  * replaces (size(NULL) = -1 takes the ELSE branch).
  */
case class ShingleHashesExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> argument, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_shingle_hashes"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) Kernels.emptyLongArray()
    else Kernels.shingleHashes(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val childGen = child.genCode(ctx)
    val javaType = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
      .javaType(dataType)
    val value = ctx.freshName("shingleHashes")
    ev.copy(
      code = code"""
        ${childGen.code}
        $javaType $value = ${childGen.isNull}
          ? graft.expressions.Kernels.emptyLongArray()
          : graft.expressions.Kernels.shingleHashes(${childGen.value});
      """,
      isNull = FalseLiteral,
      value = org.apache.spark.sql.catalyst.expressions.codegen.JavaCode
        .variable(value, dataType))
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

/** Native fused overlapping-window polyhasher (see
  * [[Kernels.spanHashes]]). Like [[ShingleHashesExpr]], NOT null-safe:
  * a null token array yields an EMPTY hash array, mirroring the
  * `CASE WHEN size(toks) >= w THEN ... ELSE array() END` wrapper it
  * replaces. The window width arrives as a foldable literal.
  */
case class SpanHashesExpr(child: Expression, w: Int) extends UnaryExpression {

  require(w >= 1, "window width must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> argument, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_span_hashes"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) Kernels.emptyLongArray()
    else Kernels.spanHashes(v.asInstanceOf[ArrayData], w)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val childGen = child.genCode(ctx)
    val javaType = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
      .javaType(dataType)
    val value = ctx.freshName("spanHashes")
    ev.copy(
      code = code"""
        ${childGen.code}
        $javaType $value = ${childGen.isNull}
          ? graft.expressions.Kernels.emptyLongArray()
          : graft.expressions.Kernels.spanHashes(${childGen.value}, $w);
      """,
      isNull = FalseLiteral,
      value = org.apache.spark.sql.catalyst.expressions.codegen.JavaCode
        .variable(value, dataType))
  }

  override protected def withNewChildInternal(newChild: Expression): SpanHashesExpr =
    copy(child = newChild)
}

/** Native one-pass k-permutation MinHash minima (see
  * [[Kernels.minhashMins]]); the permutation constants arrive as
  * foldable array literals and are baked into the operator.
  */
case class MinHashMinsExpr(
    child: Expression, a: Seq[Long], b: Seq[Long], p: Long)
    extends UnaryExpression {

  require(a.length == b.length, "permutation constant arrays must align")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<bigint> argument, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash_mins"

  private lazy val aArr = a.toArray
  private lazy val bArr = b.toArray

  override def nullSafeEval(input: Any): Any =
    Kernels.minhashMins(input.asInstanceOf[ArrayData], aArr, bArr, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("mhB", bArr, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.Kernels.minhashMins($c, $aRef, $bRef, ${p}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashMinsExpr =
    copy(child = newChild)
}

/** Native distinct-intersection counter (see [[Kernels.intersectCount]]).
  * Null handling mirrors `size(array_intersect(a, b))` EXACTLY, including
  * the session's size-of-null convention (r14 ADVICE): like Spark's own
  * `Size`, the convention is captured from SQLConf at analysis time —
  * legacy (ANSI off, the graft sessions) maps a null side to -1; a
  * session with the legacy convention off gets null, so the expression
  * can never drift from the SQL it replaces if a session config changes.
  */
case class IntersectCountExpr(
    left: Expression, right: Expression, legacySizeOfNull: Boolean = true)
    extends BinaryExpression {

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"${left.dataType} and ${right.dataType}")
  override def dataType: DataType = LongType
  override def nullable: Boolean =
    !legacySizeOfNull && (left.nullable || right.nullable)
  override def prettyName: String = "graft_intersect_count"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null || r == null) { if (legacySizeOfNull) -1L else null }
    else Kernels.intersectCount(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val lg = left.genCode(ctx)
    val rg = right.genCode(ctx)
    val value = ctx.freshName("interCount")
    if (legacySizeOfNull)
      ev.copy(
        code = code"""
          ${lg.code}
          ${rg.code}
          long $value = (${lg.isNull} || ${rg.isNull}) ? -1L
            : graft.expressions.Kernels.intersectCount(${lg.value}, ${rg.value});
        """,
        isNull = FalseLiteral,
        value = org.apache.spark.sql.catalyst.expressions.codegen.JavaCode
          .variable(value, dataType))
    else {
      val isNull = ctx.freshName("interNull")
      ev.copy(
        code = code"""
          ${lg.code}
          ${rg.code}
          boolean $isNull = ${lg.isNull} || ${rg.isNull};
          long $value = $isNull ? -1L
            : graft.expressions.Kernels.intersectCount(${lg.value}, ${rg.value});
        """,
        isNull = org.apache.spark.sql.catalyst.expressions.codegen.JavaCode
          .isNullVariable(isNull),
        value = org.apache.spark.sql.catalyst.expressions.codegen.JavaCode
          .variable(value, dataType))
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCountExpr =
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
    entry("graft_ws_tokens", classOf[WsTokensExpr], 1)(
      exprs => WsTokensExpr(exprs.head)),
    entry("graft_shingle_hashes", classOf[ShingleHashesExpr], 1)(
      exprs => ShingleHashesExpr(exprs.head)),
    entry("graft_span_hashes", classOf[SpanHashesExpr], 2)(
      exprs => {
        require(exprs(1).foldable, "graft_span_hashes width must be literal")
        val w = exprs(1).eval(null) match {
          case i: java.lang.Integer => i.intValue()
          case l: java.lang.Long => l.intValue()
          case o => sys.error(s"graft_span_hashes width must be integral, got $o")
        }
        SpanHashesExpr(exprs(0), w)
      }),
    entry("graft_l2sq", classOf[L2SqExpr], 2)(
      exprs => L2SqExpr(exprs(0), exprs(1))),
    entry("graft_intersect_count", classOf[IntersectCountExpr], 2)(
      // Like Spark's Size.apply: the size-of-null convention is read from
      // the ACTIVE session's conf at analysis time, not hardcoded.
      exprs => IntersectCountExpr(exprs(0), exprs(1),
        org.apache.spark.sql.internal.SQLConf.get.legacySizeOfNull)),
    entry("graft_minhash_mins", classOf[MinHashMinsExpr], 4)(
      exprs => {
        def longs(e: Expression): Seq[Long] = {
          require(e.foldable,
            "graft_minhash_mins permutation constants must be literal arrays")
          val ad = e.eval(null).asInstanceOf[ArrayData]
          e.dataType match {
            case ArrayType(LongType, _) => ad.toLongArray.toSeq
            case ArrayType(org.apache.spark.sql.types.IntegerType, _) =>
              ad.toIntArray.map(_.toLong).toSeq
            case t => sys.error(
              s"graft_minhash_mins constants must be integral arrays, got $t")
          }
        }
        require(exprs(3).foldable, "graft_minhash_mins modulus must be literal")
        val p = exprs(3).eval(null) match {
          case l: java.lang.Long => l.longValue()
          case i: java.lang.Integer => i.longValue()
          case o => sys.error(s"graft_minhash_mins modulus must be integral, got $o")
        }
        MinHashMinsExpr(exprs(0), longs(exprs(1)), longs(exprs(2)), p)
      }),
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
