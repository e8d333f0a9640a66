package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for hot keys that AQE's skew-join splitting
  * can't fully absorb (e.g. a single plan_id carrying 30% of a 100 TB
  * fact table). Salting is deterministic — no rand() — so results are
  * reproducible and retries are safe.
  */
object SkewJoin {

  /** Salted equi-join: the (large, skewed) left side gets a deterministic
    * salt derived from its non-key payload hash; the (smaller) right side
    * is replicated across all salt buckets. Key cardinality seen by the
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
      joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(Set("inner", "left", "left_outer").contains(joinType),
      s"salted join supports inner/left joins, got $joinType")
    val saltCol = "_salt"
    val payload = left.columns.filterNot(keys.contains)
    val leftSalt =
      if (payload.isEmpty) lit(0)
      else pmod(hash(payload.map(col): _*), lit(buckets))
    val l = left.withColumn(saltCol, leftSalt)
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
      finalAggs: Seq[Column]): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val saltCol = "_salt"
    val payload = df.columns.filterNot(keys.contains)
    val salt =
      if (payload.isEmpty) lit(0)
      else pmod(hash(payload.map(col): _*), lit(buckets))
    df.withColumn(saltCol, salt)
      .groupBy((keys :+ saltCol).map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }
}
