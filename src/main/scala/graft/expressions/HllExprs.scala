package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** HyperLogLog (Flajolet, Fusy, Gandouet & Meunier 2007) as a native
  * Spark aggregate — the distinct-count member of the sketch family
  * (Bloom = membership, CMS = frequency, SpaceSaving = top-k, log-bucket
  * histogram = quantiles; the KMV bottom-k sketch also counts distinct
  * but keeps O(k) values — HLL keeps 256 BYTES, period). One register
  * byte per bucket, update = max(register, rho), MERGE IS ELEMENT-WISE
  * MAX — commutative and idempotent, so partial sketches combine through
  * any shuffle schedule and even double-counted partitions cannot skew
  * the summary (max, unlike add, is re-aggregation safe).
  *
  * The bucket/rho derivation is a pure function of the `graft_polyhash`
  * key, NOT a JVM-private hash: bucket = key mod 256, rho = trailing
  * zeros of (key div 256) + 1 (capped). The sketch contents are thus a
  * deterministic function of the key SET (order- and
  * multiplicity-independent), which is what lets the DuckDB oracle
  * rebuild every register relationally and certify the distributed
  * build/merge bit-for-bit. The estimator is published in pure integer
  * arithmetic (fixed-point alpha, power-of-two harmonic sum scaled by
  * 2^r_max) so both engines agree exactly — see `tdp_hll_distinct`.
  */
object Hll {
  /** Register count m = 2^8. */
  val M = 256

  /** rho cap: polyhash keys live in [0, 1e9+7), so key div 256 carries
    * ~22 usable bits; 23 marks the all-zero suffix.
    */
  val MaxRho = 23

  /** alpha_256 = 0.7213/(1 + 1.079/256), scaled by 1e7 and frozen as a
    * spec constant so both engines multiply by the same integer.
    */
  val AlphaE7 = 7182726L

  def bucket(key: Long): Int = java.lang.Math.floorMod(key, M.toLong).toInt

  def rho(key: Long): Int = {
    val v = java.lang.Math.floorMod(key, 1000000007L) / M
    if (v == 0L) MaxRho
    else math.min(java.lang.Long.numberOfTrailingZeros(v) + 1, MaxRho)
  }

  /** Integer-exact raw-HLL estimate from a register array: with
    * r = max register and S = sum of 2^(r - reg_j) over ALL m registers
    * (zero registers contribute 2^r), the harmonic mean estimate
    * alpha·m²/Σ2^(-reg_j) equals alpha·m²·2^r / S — computed entirely in
    * Long arithmetic (max magnitude ~3.9e18 < 2^63) with one floor
    * division, so a second engine reproduces it bit-for-bit.
    */
  def estimate(regs: Array[Byte]): Long = {
    val rMax = regs.map(_.toInt).max
    val s = regs.map(r => 1L << (rMax - r.toInt)).sum
    AlphaE7 * M * M * (1L << rMax) / (s * 10000000L)
  }
}

/** `graft_hll_estimate(sketch BINARY) -> BIGINT` — the integer-exact
  * raw-HLL estimate of a serialized register array. Unlike the CMS probe
  * (foldable literal sketch), this runs per ROW so `groupBy(dim)
  * .agg(graft_hll_estimate(graft_hll_agg(key)))` answers per-group
  * cardinality with 256 bytes of state per group — the production shape
  * (distinct tokens per language, distinct users per shard, ...).
  */
case class HllEstimateExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary HLL sketch, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hll_estimate"

  def estimate(bytes: Array[Byte]): Long = {
    require(bytes.length == Hll.M,
      s"HLL sketch must be ${Hll.M} bytes, got ${bytes.length}")
    Hll.estimate(bytes)
  }

  override def nullSafeEval(bytes: Any): Any =
    estimate(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("graftHllExpr", this,
      classOf[HllEstimateExpr].getName)
    nullSafeCodeGen(ctx, ev, b => s"${ev.value} = $ref.estimate($b);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): HllEstimateExpr = copy(child = newChild)
}

/** `graft_hll_agg(key BIGINT) -> BINARY` — build the 256-byte sketch. */
case class HllBuildAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint key column, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hll_agg"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](Hll.M)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[Long]
      val b = Hll.bucket(k)
      val r = Hll.rho(k).toByte
      if (r > buffer(b)) buffer(b) = r
    }
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < Hll.M) {
      if (other(i) > buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = buffer

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllBuildAgg =
    copy(child = newChildren(0))
}
