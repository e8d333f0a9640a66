package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the multi-dimensional clustering
  * device behind Delta/Iceberg `OPTIMIZE ZORDER BY`: interleave the bits
  * of two bucketed dimensions so rows close on the curve are close in
  * BOTH dimensions, then range-partition + sort by the curve value. Files
  * written in that order carry parquet min/max footer stats that are
  * TIGHT on both columns simultaneously, so a scan filtered on either
  * dimension (or both) prunes most files — where a linear sort gives
  * pruning on its leading column only.
  *
  * The interleave is an UNROLLED integer expression (shift/and/or per
  * bit) — pure Catalyst arithmetic inside whole-stage codegen, no UDF —
  * and the layout itself is exactly one range exchange + local sort, the
  * same cost as any ORDER BY write. Nothing here is data-dependent
  * (no sampled quantiles beyond Spark's own range partitioner), so the
  * operator composes with AQE and survives any scale: the exchange
  * shuffles each row once, and curve locality is a per-row property.
  */
object ZOrderLayout {

  /** Morton code of two pre-bucketed non-negative int columns, `bits`
    * bits each (result has `2*bits` bits): bit i of `xb` lands at even
    * position 2i, bit i of `yb` at odd position 2i+1.
    */
  def zvalue(xb: Column, yb: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      (shiftleft(shiftright(xb, i).bitwiseAND(lit(1)), 2 * i) +
        shiftleft(shiftright(yb, i).bitwiseAND(lit(1)), 2 * i + 1))
    }.reduce(_ + _)
  }

  /** SQL twin of [[zvalue]] (DuckDB dialect: `>>`/`<<`/`&`) so an oracle
    * can replicate the curve bit-for-bit.
    */
  def zvalueSql(xb: String, yb: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($xb >> $i) & 1) << ${2 * i}) + ((($yb >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")

  /** Lay `df` out along the curve: one range exchange on the z-value and
    * a partition-local sort — the shape a `write.parquet` consumes so
    * every output file covers a compact curve segment (and therefore a
    * compact box in (x, y) space). `zCol` stays in the output so callers
    * can inspect or re-use it; drop it before writing if undesired.
    */
  def layout(
      df: DataFrame,
      xb: Column,
      yb: Column,
      bits: Int,
      partitions: Int): DataFrame =
    df.withColumn("zval", zvalue(xb, yb, bits))
      .repartitionByRange(partitions, col("zval"))
      .sortWithinPartitions("zval")
}
