package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

/** Misra-Gries / SpaceSaving frequent-items summary as a native Spark
  * aggregate — the deterministic-BOUNDS member of the sketch family
  * (Bloom = membership, CMS = frequency, KMV = distinct count, MG =
  * top-k candidates). At most `k` counters per task; merge is pointwise
  * counter addition followed by the Agarwal et al. ("Mergeable
  * Summaries", PODS'12) Misra-Gries compress: subtract the (k+1)-th
  * largest count from every counter and drop the non-positive ones.
  *
  * Guarantees (order- and merge-tree-INDEPENDENT, spec-asserted):
  *   - each reported counter is a LOWER bound on the key's true count,
  *     and `count + err_total` an upper bound;
  *   - `err_total <= n / (k + 1)` (n = rows aggregated), so every key
  *     with true count > n/(k+1) is guaranteed PRESENT in the summary.
  *
  * The summary CONTENTS, however, are a function of the merge tree, not
  * of the key multiset alone (the compress step is not associative) —
  * which is why this aggregate is certified by bound-asserting specs
  * rather than a cross-engine hash-matched oracle row. The oracle-paired
  * production query for deterministic heavy hitters is
  * `tdp_topk_sketch`: a CMS-prefiltered exact recount, whose operators
  * are all commutative. See SCALING.md ("Heavy hitters").
  *
  * Buffer layout: n (rows seen), errTotal (decrement mass), then
  * (key, count) pairs, keys sorted ascending for a canonical
  * serialization.
  */
object SpaceSaving {

  /** Decoded summary: total rows, total decrement error, counters. */
  final case class Summary(n: Long, errTotal: Long, items: Seq[(Long, Long)])

  def serialize(b: Buffer): Array[Byte] = {
    val keys = b.counts.keys.toArray.sorted
    val bb = ByteBuffer.allocate(8 + 8 + 4 + keys.length * 16)
    bb.putLong(b.n)
    bb.putLong(b.errTotal)
    bb.putInt(keys.length)
    keys.foreach { k => bb.putLong(k); bb.putLong(b.counts(k)) }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Buffer(bb.getLong, bb.getLong)
    val sz = bb.getInt
    var i = 0
    while (i < sz) { buf.counts.put(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  def decode(bytes: Array[Byte]): Summary = {
    val b = deserialize(bytes)
    Summary(b.n, b.errTotal, b.counts.toSeq.sortBy(_._1))
  }

  /** Mutable aggregation state. */
  final class Buffer(var n: Long, var errTotal: Long) {
    val counts = scala.collection.mutable.HashMap.empty[Long, Long]

    /** Classic Misra-Gries update: hit increments; a miss with a full
      * table decrements EVERY counter (the new item's own "+1" is part
      * of the k+1 decremented, so it is not inserted).
      */
    def update(key: Long, k: Int): Unit = {
      n += 1
      counts.get(key) match {
        case Some(c) => counts.put(key, c + 1)
        case None if counts.size < k => counts.put(key, 1L)
        case None =>
          errTotal += 1
          val dead = counts.iterator.collect {
            case (kk, 1L) => kk
          }.toList
          counts.mapValuesInPlace((_, c) => c - 1)
          dead.foreach(counts.remove)
      }
    }

    /** Mergeable-summaries combine: pointwise add, then compress back to
      * k counters by subtracting the (k+1)-th largest count (a
      * well-defined order statistic of the count multiset, so the
      * subtracted mass is deterministic even under count ties).
      */
    def merge(other: Buffer, k: Int): Unit = {
      n += other.n
      errTotal += other.errTotal
      other.counts.foreach { case (key, c) =>
        counts.put(key, counts.getOrElse(key, 0L) + c)
      }
      if (counts.size > k) {
        val t = counts.values.toArray.sorted(Ordering.Long.reverse).apply(k)
        errTotal += t
        val dead = counts.iterator.collect {
          case (kk, c) if c <= t => kk
        }.toList
        counts.mapValuesInPlace((_, c) => c - t)
        dead.foreach(counts.remove)
      }
    }
  }
}

/** `graft_ss_agg(key BIGINT, k INT) -> BINARY` — build the summary. */
case class SpaceSavingAgg(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSaving.Buffer] {

  private lazy val k: Int =
    kExpr.eval(InternalRow.empty).asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint key column, got ${child.dataType}")
    else if (!kExpr.foldable ||
        !Seq(IntegerType, LongType).contains(kExpr.dataType))
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a foldable int k")
    else if (kExpr.eval(InternalRow.empty) == null || k <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires k > 0")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_ss_agg"

  override def createAggregationBuffer(): SpaceSaving.Buffer =
    new SpaceSaving.Buffer(0L, 0L)

  override def update(
      buffer: SpaceSaving.Buffer, input: InternalRow): SpaceSaving.Buffer = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Long], k)
    buffer
  }

  override def merge(
      buffer: SpaceSaving.Buffer,
      other: SpaceSaving.Buffer): SpaceSaving.Buffer = {
    buffer.merge(other, k)
    buffer
  }

  override def eval(buffer: SpaceSaving.Buffer): Any =
    SpaceSaving.serialize(buffer)

  override def serialize(buffer: SpaceSaving.Buffer): Array[Byte] =
    SpaceSaving.serialize(buffer)

  override def deserialize(bytes: Array[Byte]): SpaceSaving.Buffer =
    SpaceSaving.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpaceSavingAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))
}
