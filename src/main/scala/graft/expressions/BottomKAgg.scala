package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Bottom-k (KMV) set sketch as a native Spark aggregate: keeps the k
  * smallest DISTINCT hash values per group, emitted as an ascending
  * array<bigint>.
  *
  * This is the classic K-Minimum-Values sketch (Bar-Yossef et al. 2002):
  * mergeable (union = merge + trim), O(k) state per group, and supports
  * distinct-count estimation ((k-1) * H / h_k over hash space H) and
  * set-similarity estimation (the sketch of a union is the bottom-k of the
  * merged sketches) — the aggregate-sketch counterpart of the per-document
  * MinHash signatures used by the dedup family. Unlike HyperLogLog-style
  * sketches the result is DETERMINISTIC for a given input set (no RNG, no
  * ordering dependence: the k smallest distinct values are a pure set
  * function), which is what makes it oracle-checkable bit-for-bit.
  *
  * Implemented as a TypedImperativeAggregate — the custom-AGGREGATE
  * Expression path (partial aggregation on the map side, serialized
  * buffers through the shuffle, merge on the reduce side) as opposed to
  * the scalar-expression path (NormalizeSsnExpr/PolyHashExpr/
  * DotProductExpr).
  */
case class BottomKAgg(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  private lazy val k: Int = kExpr.eval(InternalRow.empty).asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint value column, got ${child.dataType}")
    else if (kExpr.dataType != IntegerType || !kExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable int k, got $kExpr")
    else if (kExpr.eval(InternalRow.empty) == null)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a non-null k")
    else if (k <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires k > 0, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bottomk"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buffer: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val l = v.asInstanceOf[Long]
      // Skip values already above the current k-th minimum: O(log k) and
      // the buffer never exceeds k entries.
      if (buffer.size < k || l < buffer.last()) {
        buffer.add(l)
        if (buffer.size > k) buffer.pollLast()
      }
    }
    buffer
  }

  override def merge(
      buffer: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      val l = it.next()
      if (buffer.size < k || l < buffer.last()) {
        buffer.add(l)
        if (buffer.size > k) buffer.pollLast()
      }
    }
    buffer
  }

  override def eval(buffer: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buffer.size)
    val it = buffer.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.size)
    bb.putInt(buffer.size)
    val it = buffer.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))
}
