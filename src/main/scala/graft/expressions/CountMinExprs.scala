package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a native Spark
  * aggregate, the frequency-estimation companion to [[BloomBuildAgg]]
  * (membership) and [[BottomKAgg]] (distinct count): D x W counters,
  * update adds 1 to one counter per row, MERGE IS ELEMENT-WISE ADDITION —
  * the mergeable-sketch shape, so a corpus-wide frequency summary is one
  * pass with O(D·W) state per task regardless of row count, and partial
  * sketches combine associatively through the shuffle.
  *
  * The hash rows are fixed affine permutations of the key modulo a prime
  * (`((k·A_r + B_r) mod P) mod W`), NOT a JVM-private hash: the sketch
  * contents are a pure function of the key multiset, which is what lets a
  * second engine (the DuckDB oracle) replicate every counter exactly and
  * certify both the sketch math and the distributed merge. Guarantee:
  * estimate >= true count always (no under-count), overestimate bounded by
  * colliding mass per row, minimized over the D rows.
  */
object CountMin {
  val Depth = 4
  val P = 1000000007L
  val HashA: Array[Long] = Array(31L, 131L, 8191L, 131071L)
  val HashB: Array[Long] = Array(7L, 101L, 1009L, 10007L)

  /** Bucket of `key` in hash row `r` for width `w`. Keys are expected in
    * [0, P) — the graft_polyhash range; arbitrary longs are folded in.
    */
  def bucket(key: Long, r: Int, w: Int): Int = {
    val k = java.lang.Math.floorMod(key, P)
    ((k * HashA(r) + HashB(r)) % P % w).toInt
  }

  def serialize(w: Int, counters: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + counters.length * 8)
    bb.putInt(w)
    counters.foreach(bb.putLong)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): (Int, Array[Long]) = {
    val bb = ByteBuffer.wrap(bytes)
    val w = bb.getInt
    val counters = new Array[Long](Depth * w)
    var i = 0
    while (i < counters.length) { counters(i) = bb.getLong; i += 1 }
    (w, counters)
  }
}

/** `graft_cms_agg(key BIGINT, width INT) -> BINARY` — build the sketch. */
case class CountMinBuildAgg(
    child: Expression,
    widthExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private lazy val width: Int =
    widthExpr.eval(InternalRow.empty).asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint key column, got ${child.dataType}")
    else if (!widthExpr.foldable ||
        !Seq(IntegerType, LongType).contains(widthExpr.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable int width")
    else if (widthExpr.eval(InternalRow.empty) == null || width <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires width > 0")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = Seq(child, widthExpr)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms_agg"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](CountMin.Depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[Long]
      var r = 0
      while (r < CountMin.Depth) {
        buffer(r * width + CountMin.bucket(k, r, width)) += 1L
        r += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    CountMin.serialize(width, buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] =
    CountMin.serialize(width, buffer)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    CountMin.deserialize(bytes)._2

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinBuildAgg =
    copy(child = newChildren(0), widthExpr = newChildren(1))
}

/** `graft_cms_estimate(key BIGINT, sketch BINARY) -> BIGINT` — point
  * frequency estimate: min over the D rows of the key's counter. The
  * sketch rides in as a foldable literal (the one fixed-size row the
  * build side collected — the [[BloomMightContainExpr]] driver-hop
  * pattern), deserialized once per JVM; the probe itself is D array
  * reads inside whole-stage codegen, no UDF boundary.
  */
case class CountMinEstimateExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint key, got ${left.dataType}")
    else if (right.dataType != BinaryType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable binary serialized sketch")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"

  @transient private lazy val sketch: (Int, Array[Long]) =
    CountMin.deserialize(
      right.eval(InternalRow.empty).asInstanceOf[Array[Byte]])

  /** Shared by interpreted eval and generated code. */
  def estimate(k: Long): Long = {
    val (w, counters) = sketch
    var est = Long.MaxValue
    var r = 0
    while (r < CountMin.Depth) {
      val c = counters(r * w + CountMin.bucket(k, r, w))
      if (c < est) est = c
      r += 1
    }
    est
  }

  override def nullSafeEval(k: Any, ignoredBytes: Any): Any =
    estimate(k.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCmsExpr", this,
      classOf[CountMinEstimateExpr].getName)
    nullSafeCodeGen(ctx, ev, (k, _) => s"${ev.value} = $ref.estimate($k);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountMinEstimateExpr =
    copy(left = newLeft, right = newRight)
}

/** `graft_cms_dot(a BINARY, b BINARY) -> BIGINT` — sketch inner product:
  * for each hash row r, sum over buckets of `a[r][j] * b[r][j]`, minimized
  * over the D rows. With both sketches built by [[CountMinBuildAgg]] over
  * the join keys of two relations, this is the Cormode–Muthukrishnan
  * estimator for the equi-join SIZE `|A JOIN B|  =  sum_k f_A(k)·f_B(k)`:
  * every true key pair lands in the same bucket in every row (same fixed
  * affine hashes), so the estimate NEVER undercounts; colliding mass only
  * adds, bounded in expectation by `L1(A)·L1(B) / W` per row and minimized
  * over rows. The planner-side use at 100 TB: decide whether a candidate
  * join (e.g. the dedup shingle self-join) is launchable BEFORE shuffling
  * anything — two O(D·W) sketches replace the join itself.
  *
  * Both arguments are foldable literals (driver-hop sketches); widths must
  * match — mismatched widths are a query-construction bug and throw.
  */
case class CountMinDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType || right.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two binary serialized sketches")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_dot"

  /** Shared by interpreted eval and generated code. */
  def dot(aBytes: Array[Byte], bBytes: Array[Byte]): Long = {
    val (wa, ca) = CountMin.deserialize(aBytes)
    val (wb, cb) = CountMin.deserialize(bBytes)
    require(wa == wb, s"$prettyName: sketch widths differ ($wa vs $wb)")
    var est = Long.MaxValue
    var r = 0
    while (r < CountMin.Depth) {
      var s = 0L
      var j = 0
      while (j < wa) {
        s += ca(r * wa + j) * cb(r * wa + j)
        j += 1
      }
      if (s < est) est = s
      r += 1
    }
    est
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    dot(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCmsDotExpr", this,
      classOf[CountMinDotExpr].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.dot($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountMinDotExpr =
    copy(left = newLeft, right = newRight)
}
