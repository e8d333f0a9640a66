package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType,
  StructField, StructType}

/** Grouped top-n as a bounded-heap native aggregate:
  * `graft_topn(score BIGINT, id BIGINT, n INT)
  *    -> ARRAY<STRUCT<score BIGINT, id BIGINT>>`
  * ranked by (score DESC, id ASC) — the id is the deterministic
  * tie-break, so for unique ids the result is a pure set function of the
  * input (no ordering dependence), which is what makes it
  * oracle-checkable.
  *
  * This is the shuffle-shape fix for "top n rows per group": the
  * ubiquitous `row_number() OVER (PARTITION BY g ORDER BY s DESC) <= n`
  * window SHUFFLES AND SORTS EVERY ROW of every group before discarding
  * all but n of them. As a TypedImperativeAggregate the top-n runs as
  * partial aggregation on the map side — each task reduces its slice of a
  * group to at most n (score, id) pairs in an O(log n) bounded heap — and
  * only those n-row buffers cross the shuffle, merged heap-wise on the
  * reduce side. At 100 TB with hot groups (a source with billions of
  * docs) the window sorts billions of rows per group; this moves O(n ·
  * partitions) rows and never sorts more than n of them at once.
  */
case class TopNAgg(
    scoreExpr: Expression,
    idExpr: Expression,
    nExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Long, Long)]] {

  private lazy val n: Int =
    nExpr.eval(InternalRow.empty).asInstanceOf[Number].intValue()

  /** (score DESC, id ASC): the TreeSet's FIRST element is the current
    * best, its LAST the weakest member — the eviction candidate.
    * Overflow-safe comparison (no negation: `-Long.MinValue` overflows
    * back to `Long.MinValue` and would rank the worst score as best).
    *
    * Note the TreeSet is a SET: two input rows with the identical
    * (score, id) pair collapse to one ranked entry, unlike the
    * `row_number()` window formulation which would keep both. For the
    * intended unique-id use this is a non-difference; callers ranking
    * non-unique (score, id) rows should pre-aggregate.
    */
  private val ord: Ordering[(Long, Long)] = new Ordering[(Long, Long)] {
    override def compare(a: (Long, Long), b: (Long, Long)): Int = {
      val byScore = java.lang.Long.compare(b._1, a._1)
      if (byScore != 0) byScore else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (scoreExpr.dataType != LongType || idExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires bigint (score, id) columns, got " +
          s"(${scoreExpr.dataType}, ${idExpr.dataType})")
    else if (nExpr.dataType != IntegerType || !nExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable int n, got $nExpr")
    else if (nExpr.eval(InternalRow.empty) == null || n <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires n > 0")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr, nExpr)
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", LongType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topn"

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Long)] =
    new java.util.TreeSet[(Long, Long)](ord)

  private def offer(
      buffer: java.util.TreeSet[(Long, Long)], e: (Long, Long)): Unit =
    if (buffer.size < n || ord.lt(e, buffer.last())) {
      buffer.add(e)
      if (buffer.size > n) buffer.pollLast()
    }

  override def update(
      buffer: java.util.TreeSet[(Long, Long)],
      input: InternalRow): java.util.TreeSet[(Long, Long)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      offer(buffer, (s.asInstanceOf[Long], i.asInstanceOf[Long]))
    buffer
  }

  override def merge(
      buffer: java.util.TreeSet[(Long, Long)],
      other: java.util.TreeSet[(Long, Long)]): java.util.TreeSet[(Long, Long)] = {
    val it = other.iterator()
    while (it.hasNext) offer(buffer, it.next())
    buffer
  }

  override def eval(buffer: java.util.TreeSet[(Long, Long)]): Any = {
    val out = new Array[Any](buffer.size)
    val it = buffer.iterator()
    var i = 0
    while (it.hasNext) {
      val (s, id) = it.next()
      out(i) = new GenericInternalRow(Array[Any](s, id))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: java.util.TreeSet[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.size)
    bb.putInt(buffer.size)
    val it = buffer.iterator()
    while (it.hasNext) {
      val (s, i) = it.next()
      bb.putLong(s)
      bb.putLong(i)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val m = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < m) { buf.add((bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopNAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopNAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopNAgg =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1),
      nExpr = newChildren(2))
}
