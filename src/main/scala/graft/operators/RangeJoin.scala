package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Band (range-interval) join: all pairs with `|left.time - right.time|
  * <= width` within the same key group — an operator Spark has no native
  * physical plan for. A naive non-equi condition plans as a nested-loop
  * join (O(|L| x |R|) comparisons, and with no equi keys a broadcast
  * nested loop); this composition buckets both sides by
  * `floor(time / width)` and replicates the RIGHT side to its own and
  * both neighbor buckets, turning the band predicate into a plain
  * equi-join on (keys..., bucket) followed by the exact band filter.
  *
  * Every qualifying pair is emitted exactly once: the left row lives in
  * exactly one bucket, and a band match implies the bucket distance is
  * at most 1, so precisely one right replica lands in the left row's
  * bucket. Replication is bounded at 3x the right side regardless of
  * data, and the shuffle key is (keys, bucket) — the join distributes
  * like any hash join at 100 TB instead of degenerating into a
  * nested loop.
  */
object RangeJoin {

  /** @param left      left side; `leftTime` must be a non-negative
    *                  integral column (epoch seconds etc. — `div`
    *                  truncates toward zero, so negative times would
    *                  split a band across non-adjacent buckets)
    * @param right     right side; column names must be disjoint from
    *                  the left's except for `keys`
    * @param keys      equi-join key columns present on both sides
    * @param leftTime  left ordering column name
    * @param rightTime right ordering column name
    * @param width     band half-width (inclusive), in `time` units; also
    *                  the bucket width
    */
  def bandJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      width: Long): DataFrame = {
    require(width > 0, s"band width must be positive, got $width")
    val bucket = "_rj_bucket"
    val lb = left.withColumn(bucket, expr(s"$leftTime div $width"))
    val replicas = array((-1 to 1).map(d =>
      expr(s"($rightTime div $width) + $d")): _*)
    val rb = right.withColumn(bucket, explode(replicas))
    lb.join(rb, keys :+ bucket)
      .filter(abs(col(leftTime) - col(rightTime)) <= width)
      .drop(bucket)
  }
}
