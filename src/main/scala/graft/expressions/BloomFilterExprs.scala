package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, IntegerType, LongType, BooleanType}
import org.apache.spark.util.sketch.BloomFilter

/** Distributed Bloom-filter build as a native Spark aggregate: each map
  * task inserts its partition's keys into a local
  * `org.apache.spark.util.sketch.BloomFilter` (the public sketch Spark
  * itself broadcasts for runtime row-group filtering), partial filters
  * ride the shuffle as serialized bytes, and merge is a bitwise OR — the
  * textbook mergeable-sketch shape, so the build is one pass over the
  * corpus with O(filter size) state per task regardless of row count.
  *
  * Emits the serialized filter (binary). The caller collects this ONE
  * fixed-size row (a few hundred KB for ~10^6 keys at 1% fpp — sized by
  * the `expected`/`fpp` params, never by the data) and feeds it to
  * [[BloomMightContainExpr]] on the probe side. That driver hop is the
  * same pattern as Spark's own InjectRuntimeFilter / broadcast-join
  * exchange: sketch-sized, not data-sized.
  */
case class BloomBuildAgg(
    child: Expression,
    expectedExpr: Expression,
    fppExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  private def fold(e: Expression): Any = e.eval(InternalRow.empty)

  private lazy val expected: Long =
    fold(expectedExpr).asInstanceOf[Number].longValue()
  private lazy val fpp: Double =
    fold(fppExpr).asInstanceOf[Number].doubleValue()

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint key column, got ${child.dataType}")
    else if (!expectedExpr.foldable ||
        !Seq(IntegerType, LongType).contains(expectedExpr.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable int/bigint expected-item count")
    else if (!fppExpr.foldable || fppExpr.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable double fpp")
    else if (fold(expectedExpr) == null || expected <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires expected > 0")
    else if (fold(fppExpr) == null || fpp <= 0.0 || fpp >= 1.0)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires fpp in (0, 1)")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = Seq(child, expectedExpr, fppExpr)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_agg"

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expected, fpp)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buffer.putLong(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BloomFilter, other: BloomFilter): BloomFilter = {
    buffer.mergeInPlace(other)
    buffer
  }

  override def eval(buffer: BloomFilter): Any = serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buffer.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomBuildAgg =
    copy(child = newChildren(0), expectedExpr = newChildren(1),
      fppExpr = newChildren(2))
}

/** Membership probe against a serialized Bloom filter carried as a
  * foldable binary argument (a literal produced by [[BloomBuildAgg]]).
  * The filter is deserialized ONCE per JVM from the literal bytes
  * (transient lazy), then every row is a few hash-and-test bit probes —
  * and codegen calls the probe directly, so a bloom prefilter stays
  * inside whole-stage codegen with no UDF boundary.
  *
  * Guarantee (from the sketch contract): never a false NEGATIVE for a
  * key inserted by the build side — so `NOT mightContain` rows can skip
  * the exact-verification join entirely, which is the whole point of the
  * prefilter at 100 TB.
  */
case class BloomMightContainExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint key, got ${left.dataType}")
    else if (right.dataType != BinaryType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable binary serialized filter")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  @transient private lazy val filter: BloomFilter = {
    val bytes = right.eval(InternalRow.empty).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  /** Shared by interpreted eval and generated code (via a reference to
    * this expression object, which serializes its literal child and
    * rebuilds the transient filter lazily in each executor JVM).
    */
  def contains(h: Long): Boolean = filter.mightContainLong(h)

  override def nullSafeEval(h: Any, ignoredBytes: Any): Any =
    contains(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloomExpr", this,
      classOf[BloomMightContainExpr].getName)
    nullSafeCodeGen(ctx, ev, (h, _) => s"${ev.value} = $ref.contains($h);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContainExpr =
    copy(left = newLeft, right = newRight)
}
