package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-prior) join — an operator Spark lacks natively,
  * composed from a union + ordered window instead of a theta join:
  * for every left row, attach the latest right row with
  * `right.timeCol <= left.timeCol` within the same key group.
  *
  * The naive formulation (range theta-join + per-left-row max) shuffles
  * |L| x |R| candidate pairs; this composition shuffles |L| + |R| rows
  * exactly once on the key and scans each partition in time order —
  * the same plan a hand-written merge-asof would produce, but expressed
  * with built-in operators so Catalyst/AQE still manage it.
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      build side (latest row at-or-before each left time wins)
    * @param keys       equi-join keys
    * @param timeCol    ordering column name, present on both sides (numeric
    *                   or timestamp)
    * @param rightCols  right-side payload columns to attach (as `<col>_asof`)
    * @param tieBreaker right-side column ordering ties at identical times
    *                   (largest wins); required for deterministic output
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      timeCol: String,
      rightCols: Seq[String],
      tieBreaker: String): DataFrame = {
    val tag = "_asof_tag"
    val leftCols = left.columns.filterNot(c => keys.contains(c) || c == timeCol).toSeq
    val payload = "_asof_payload"
    val tie = "_asof_tie"

    // The whole right payload travels as ONE nullable struct, so the window
    // always picks every attached column from the same right row (per-column
    // last(ignoreNulls) could otherwise stitch together different rows when
    // payload values are null).
    val l = left
      .withColumn(tag, lit(1))
      .withColumn(payload,
        lit(null).cast(org.apache.spark.sql.types.StructType(
          rightCols.map(c => right.schema(c).copy(name = c)))))
      .withColumn(tie, lit(null).cast(right.schema(tieBreaker).dataType))
      .select((keys :+ timeCol :+ tag :+ payload :+ tie).map(col) ++
        leftCols.map(col): _*)
    val r = right
      .withColumn(tag, lit(0))
      .withColumn(payload, struct(rightCols.map(col): _*))
      .withColumn(tie, col(tieBreaker))
      .select((keys :+ timeCol :+ tag :+ payload :+ tie).map(col) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    // Right rows (tag 0) sort before left rows (tag 1) at equal times, so
    // `right.time <= left.time` is inclusive, like SQL ASOF JOIN; among
    // same-time right rows the largest tie-breaker sorts last and wins.
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col(tag).asc, col(tie).asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("_asof_match", last(col(payload), ignoreNulls = true).over(w))
      .filter(col(tag) === 1)
      .select((keys :+ timeCol).map(col) ++
        leftCols.map(col) ++
        rightCols.map(c => col(s"_asof_match.$c").as(s"${c}_asof")): _*)
  }
}
