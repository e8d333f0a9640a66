package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for hot keys that AQE's skew-join splitting
  * can't fully absorb (e.g. a single plan_id carrying 30% of a 100 TB
  * fact table). Salting is deterministic — no rand() — so results are
  * reproducible and retries are safe.
  */
object SkewJoin {

  /** Per-row salt in [0, buckets): payload hash mixed with the row's
    * partition-local ordinal (`monotonically_increasing_id`), so EXACT
    * DUPLICATE rows — the common hot-key shape dedup-style workloads
    * produce — still spread over all buckets instead of collapsing into
    * one.
    *
    * Retry safety: `monotonically_increasing_id` is row-order-dependent,
    * so for a non-scan input (a join/aggregate output with unstable
    * intra-partition order) the salt is NOT stable across partial
    * recomputes. Spark marks such expressions nondeterministic and its
    * scheduler handles a fetch failure in an indeterminate shuffle stage
    * by rerunning the WHOLE stage, not individual map tasks, so rows are
    * not lost or duplicated — the cost is a full-stage retry. Callers
    * with a natural per-row discriminator (an ingest id, a line number)
    * should pass it as `saltBy`: the salt is then a pure column function,
    * fully deterministic, and cheap to retry.
    */
  private[operators] def saltExpr(
      payload: Seq[String],
      buckets: Int,
      saltBy: Option[Column]): Column = {
    val basis = saltBy match {
      case Some(c) => Seq(c)
      case None => payload.map(col) :+ monotonically_increasing_id()
    }
    pmod(hash(basis: _*), lit(buckets))
  }

  /** Salted equi-join: the (large, skewed) left side gets a deterministic
    * per-row salt (see [[saltExpr]]); the (smaller) right side is
    * replicated across all salt buckets. Key cardinality seen by the
    * shuffle becomes |keys| x buckets, splitting each hot key's rows over
    * `buckets` reducers.
    *
    * Supports inner/left joins (right-side replication preserves their
    * semantics; full-outer would double-count unmatched right rows).
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      buckets: Int,
      joinType: String = "inner",
      saltBy: Option[Column] = None): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(Set("inner", "left", "left_outer").contains(joinType),
      s"salted join supports inner/left joins, got $joinType")
    val saltCol = "_salt"
    val payload = left.columns.filterNot(keys.contains)
    val l = left.withColumn(saltCol, saltExpr(payload.toIndexedSeq, buckets, saltBy))
    val r = right.withColumn(saltCol,
      explode(sequence(lit(0), lit(buckets - 1))))
    l.join(r, keys :+ saltCol, joinType).drop(saltCol)
  }

  /** Two-phase salted aggregation for skewed group keys: partial aggregate
    * on (keys, salt) — map-side combine splits each hot key over `buckets`
    * reducers — then final aggregate on keys. Caller supplies the partial
    * aggregates and the matching re-aggregation (sum/count -> sum, min ->
    * min, ...).
    */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      buckets: Int,
      partialAggs: Seq[Column],
      finalAggs: Seq[Column],
      saltBy: Option[Column] = None): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val saltCol = "_salt"
    val payload = df.columns.filterNot(keys.contains)
    df.withColumn(saltCol, saltExpr(payload.toIndexedSeq, buckets, saltBy))
      .groupBy((keys :+ saltCol).map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }
}
