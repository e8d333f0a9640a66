package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, JoinedRow,
  UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** A WHOLE-OPERATOR Catalyst extension: the band (range-interval) join as
  * a first-class logical plan + planner strategy + physical operator —
  * the (c) tier of custom-operator integration, complementing the
  * expression tier (graft_* functions) and the optimizer-rule tier
  * (RewriteDotProduct).
  *
  * Semantics: all (l, r) pairs with `l.key = r.key` and
  * `|l.time - r.time| <= width`. Spark's own planner turns the non-equi
  * time predicate into a nested-loop join; the DataFrame-level
  * alternative (`operators.RangeJoin`) buckets + replicates 3x into an
  * equi-join. This operator instead plans a BROADCAST RANGE JOIN: the
  * small side is collected ONCE, grouped by key and time-sorted, and
  * each left row binary-searches its key's sorted times for the
  * [t - width, t + width] slice — O(log n + matches) per probe, ZERO
  * shuffle and zero replication of either side. The big side streams
  * through untouched (outputPartitioning is inherited), which is the
  * property the plan spec asserts: no Exchange anywhere.
  */
final case class BroadcastRangeJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: String,
    leftTime: String,
    rightKey: String,
    rightTime: String,
    width: Long,
    // True when this node was produced by RewriteRangeJoin, whose
    // autoBroadcastJoinThreshold check already proved the build side's
    // size statistic broadcastable — BroadcastLintSpec blesses such
    // nodes and polices only DIRECT bandJoin() calls, which carry no
    // size evidence.
    viaSizeGuard: Boolean = false)
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  /** The node consumes (and re-emits) EVERY child column — without this,
    * ColumnPruning sees an expression-free node with empty references and
    * projects the children down to whatever the PARENT selects, stripping
    * the key/time columns the physical operator needs (observed).
    */
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      left.output ++ right.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): BroadcastRangeJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** AS-OF LEFT join as a first-class operator: for each left row, the
  * single build-side row of the same key with the LARGEST time <= left
  * time — or nulls when none exists. Same broadcast + binary-search
  * economics as the range join (the floor probe is one search, emitting
  * exactly one row). The build side must have UNIQUE (key, time) pairs —
  * enforcing this loudly at build keeps the result deterministic (a
  * stable tie would otherwise depend on collection order); callers
  * dedupe ties upstream exactly as the window-based `operators.AsOfJoin`
  * formulation requires.
  */
final case class BroadcastAsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: String,
    leftTime: String,
    rightKey: String,
    rightTime: String)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** See [[BroadcastRangeJoinPlan.references]]. */
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      left.output ++ right.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): BroadcastAsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: lowers the graft logical join nodes to their
  * physical operators; injected via
  * `SparkSessionExtensions.injectPlannerStrategy` (and idempotently
  * through `spark.experimental.extraStrategies` for sessions built
  * without the extensions config).
  */
object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: BroadcastRangeJoinPlan =>
      BroadcastRangeJoinExec(planLater(p.left), planLater(p.right),
        p.leftKey, p.leftTime, p.rightKey, p.rightTime, p.width) :: Nil
    case BroadcastAsOfJoinPlan(l, r, lk, lt, rk, rt) =>
      BroadcastAsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt) :: Nil
    case _ => Nil
  }
}

/** Shared build-side machinery for the broadcast joins: the index ships
  * as raw UnsafeRow BYTES (one flat byte array per row), not row
  * objects — Java serialization of a 100k-object map measured ~4 s of
  * driver wall per query; byte arrays serialize linearly in size.
  * Executors wrap matches in one reusable UnsafeRow via pointTo.
  */
private[plans] object RangeJoinBuild {
  final case class Bucket(times: Array[Long], rows: Array[Array[Byte]])

  def buildIndex(
      right: SparkPlan,
      rkIdx: Int,
      rtIdx: Int,
      uniqueTimes: Boolean): Map[Any, Bucket] = {
    val rkType = right.output(rkIdx).dataType
    val toUnsafe = UnsafeProjection.create(
      right.output.map(_.dataType).toArray)
    val grouped = scala.collection.mutable.HashMap
      .empty[Any, scala.collection.mutable.ArrayBuffer[(Long, Array[Byte])]]
    right.executeCollect().foreach { row =>
      // SQL join semantics: NULL = NULL is not true, and a NULL time
      // satisfies no band/floor predicate — a build row with a null key
      // or time can never match, so it never enters the index. Without
      // this, a null key would become an ordinary map key (matching
      // null probes) and getLong would read a null time as t=0.
      if (row.isNullAt(rkIdx) || row.isNullAt(rtIdx)) ()
      else {
      val k = InternalRow.copyValue(row.get(rkIdx, rkType))
      val bytes = row match {
        case u: org.apache.spark.sql.catalyst.expressions.UnsafeRow =>
          u.getBytes
        case r => toUnsafe(r).getBytes
      }
      grouped.getOrElseUpdate(k,
        scala.collection.mutable.ArrayBuffer.empty) +=
        ((row.getLong(rtIdx), bytes))
      }
    }
    grouped.map { case (k, buf) =>
      val sorted = buf.sortBy(_._1)
      val times = sorted.map(_._1).toArray
      if (uniqueTimes) {
        var i = 1
        while (i < times.length) {
          require(times(i) != times(i - 1),
            s"as-of build side has duplicate (key, time) = ($k, ${times(i)})" +
              " — dedupe ties upstream, the result would be nondeterministic")
          i += 1
        }
      }
      k -> Bucket(times, sorted.map(_._2).toArray)
    }.toMap
  }
}

/** Physical broadcast range join. The right side must be the small one
  * (it is collected to the driver and broadcast, like Spark's own
  * BroadcastHashJoin build side); both time columns must be LongType and
  * both key columns of an atomic type.
  */
final case class BroadcastRangeJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: String,
    leftTime: String,
    rightKey: String,
    rightTime: String,
    width: Long)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def outputPartitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastRangeJoinExec =
    copy(left = newLeft, right = newRight)

  private def idx(plan: SparkPlan, name: String): Int = {
    val i = plan.output.indexWhere(_.name == name)
    require(i >= 0, s"column $name not found in ${plan.output.map(_.name)}")
    i
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val rkIdx = idx(right, rightKey)
    val rtIdx = idx(right, rightTime)
    require(right.output(rtIdx).dataType == LongType,
      s"$rightTime must be LongType")
    val lkIdx = idx(left, leftKey)
    val ltIdx = idx(left, leftTime)
    val lkType = left.output(lkIdx).dataType
    require(left.output(ltIdx).dataType == LongType,
      s"$leftTime must be LongType")

    // Build: collect + group + time-sort the small side once, packed as
    // raw row bytes (see RangeJoinBuild).
    val bcast = sparkContext.broadcast(
      RangeJoinBuild.buildIndex(right, rkIdx, rtIdx, uniqueTimes = false))
    val w = width
    val leftOut = left.output
    val rightOut = right.output
    val outAttrs = output
    val nRightFields = right.output.length

    left.execute().mapPartitions({ iter =>
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, leftOut ++ rightOut)
      val rrow = new org.apache.spark.sql.catalyst.expressions
        .UnsafeRow(nRightFields)
      val buckets = bcast.value
      iter.flatMap { lrow =>
        // NULL key or time matches nothing under inner-join semantics.
        val bucket =
          if (lrow.isNullAt(lkIdx) || lrow.isNullAt(ltIdx)) None
          else buckets.get(lrow.get(lkIdx, lkType))
        bucket match {
          case None => Iterator.empty
          case Some(b) =>
            val t = lrow.getLong(ltIdx)
            // First index with time >= t - w, first index with
            // time > t + w: the [lo, hi) slice is the band.
            var lo = java.util.Arrays.binarySearch(b.times, t - w)
            if (lo < 0) lo = -lo - 1
            else while (lo > 0 && b.times(lo - 1) == t - w) lo -= 1
            var hi = java.util.Arrays.binarySearch(b.times, t + w)
            if (hi < 0) hi = -hi - 1
            else {
              while (hi < b.times.length && b.times(hi) == t + w) hi += 1
            }
            (lo until hi).iterator.map { i =>
              val bytes = b.rows(i)
              rrow.pointTo(bytes, bytes.length)
              proj(joined(lrow, rrow))
            }
        }
      }
    }, preservesPartitioning = true)
  }
}

/** Physical broadcast as-of join (see [[BroadcastAsOfJoinPlan]]). */
final case class BroadcastAsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: String,
    leftTime: String,
    rightKey: String,
    rightTime: String)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)

  private def idx(plan: SparkPlan, name: String): Int = {
    val i = plan.output.indexWhere(_.name == name)
    require(i >= 0, s"column $name not found in ${plan.output.map(_.name)}")
    i
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val rkIdx = idx(right, rightKey)
    val rtIdx = idx(right, rightTime)
    require(right.output(rtIdx).dataType == LongType,
      s"$rightTime must be LongType")
    val lkIdx = idx(left, leftKey)
    val ltIdx = idx(left, leftTime)
    val lkType = left.output(lkIdx).dataType
    require(left.output(ltIdx).dataType == LongType,
      s"$leftTime must be LongType")

    val bcast = sparkContext.broadcast(
      RangeJoinBuild.buildIndex(right, rkIdx, rtIdx, uniqueTimes = true))
    val leftOut = left.output
    val rightOut = right.output
    val outAttrs = output
    val nRight = right.output.length

    left.execute().mapPartitions({ iter =>
      val joined = new JoinedRow
      // The input schema must carry the LEFT-join nullability, or the
      // projection's bound references read primitives (0/false) out of
      // the all-null no-match row instead of nulls.
      val proj = UnsafeProjection.create(outAttrs,
        leftOut ++ rightOut.map(_.withNullability(true)))
      val nullRight = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(nRight)
      val rrow = new org.apache.spark.sql.catalyst.expressions
        .UnsafeRow(nRight)
      val buckets = bcast.value
      iter.map { lrow =>
        // NULL key or time matches nothing; as a LEFT join the row still
        // flows through null-extended.
        val matched =
          if (lrow.isNullAt(lkIdx) || lrow.isNullAt(ltIdx)) null
          else buckets.get(lrow.get(lkIdx, lkType)) match {
            case None => null
            case Some(b) =>
              // Largest index with time <= t (floor probe).
              val t = lrow.getLong(ltIdx)
              var i = java.util.Arrays.binarySearch(b.times, t)
              if (i < 0) i = -i - 2
              if (i < 0) null
              else {
                val bytes = b.rows(i)
                rrow.pointTo(bytes, bytes.length)
                rrow
              }
          }
        proj(joined(lrow,
          if (matched == null) nullRight else matched))
      }
    }, preservesPartitioning = true)
  }
}

/** User-facing constructor for the native operator. */
object NativeRangeJoin {

  /** Register the strategy on a session built without the extensions
    * config (idempotent) — mirrors `GraftExtensions.registerAll`.
    */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(RangeJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ RangeJoinStrategy

  /** The physical operators bind columns BY NAME, so a name shared
    * across the two sides would silently bind the first match (or build
    * an invalid duplicate-attribute plan). Fail loudly instead.
    */
  private def requireDisjoint(left: DataFrame, right: DataFrame): Unit = {
    val shared = left.columns.toSeq.intersect(right.columns.toSeq)
    require(shared.isEmpty,
      s"column names must be disjoint across the two join sides; " +
        s"shared: ${shared.mkString(", ")} — alias one side first")
  }

  /** All (l, r) pairs with equal keys and `|leftTime - rightTime| <=
    * width`. `right` is the broadcast build side; column names must be
    * disjoint across the two sides.
    */
  def bandJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      leftTime: String,
      rightKey: String,
      rightTime: String,
      width: Long): DataFrame = {
    require(width > 0, s"band width must be positive, got $width")
    requireDisjoint(left, right)
    val spark = left.sparkSession
    register(spark)
    org.apache.spark.sql.GraftPlanBridge.ofRows(spark,
      BroadcastRangeJoinPlan(
        left.queryExecution.analyzed, right.queryExecution.analyzed,
        leftKey, leftTime, rightKey, rightTime, width))
  }

  /** AS-OF LEFT join: for each left row, the single `right` row of the
    * same key with the largest `rightTime <= leftTime`, or nulls. The
    * build side must be unique per (key, time) — enforced loudly.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      leftTime: String,
      rightKey: String,
      rightTime: String): DataFrame = {
    requireDisjoint(left, right)
    val spark = left.sparkSession
    register(spark)
    org.apache.spark.sql.GraftPlanBridge.ofRows(spark,
      BroadcastAsOfJoinPlan(
        left.queryExecution.analyzed, right.queryExecution.analyzed,
        leftKey, leftTime, rightKey, rightTime))
  }
}
