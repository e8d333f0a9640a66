package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Abs, And, AttributeReference,
  EqualTo, Literal, Subtract}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.LongType

/** Optimizer rule that upgrades a DECLARATIVE band join —
  *
  * {{{ left.join(right, leftKey === rightKey &&
  *                      abs(leftTime - rightTime) <= lit(w)) }}}
  *
  * — to [[BroadcastRangeJoinPlan]], which the injected strategy lowers to
  * the binary-search broadcast operator. Spark's own planner turns the
  * non-equi time bound into a nested-loop join; with this rule users keep
  * the idiomatic join-condition spelling and still get the native
  * physical plan, the same contract as [[RewriteDotProduct]] for scalar
  * kernels.
  *
  * The rewrite fires only when it is provably safe:
  *   - inner join, condition literally `EqualTo && |a - b| <= lit`, all
  *     four columns direct attribute references with LongType times;
  *   - key/time sides resolve one to each child (either orientation);
  *   - the build (right) side's size statistic fits the session's
  *     autoBroadcastJoinThreshold — the same evidence Spark's own
  *     BroadcastHashJoin selection uses;
  *   - no column name is ambiguous across the two sides (the physical
  *     operator binds by name).
  */
object RewriteRangeJoin extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(l, r, Inner, Some(cond), _) =>
      // The optimizer is free to reorder conjuncts — and to PUSH EXTRA
      // predicates into the join condition (observed: a post-join
      // `id_a < id_b` filter lands here). Match the equality + band as a
      // set and re-emit any remaining conjuncts as a Filter above the
      // rewritten operator.
      val conjuncts = splitConjunctivePredicates(cond)
      val eq = conjuncts.collectFirst {
        case e @ EqualTo(_: AttributeReference, _: AttributeReference) => e
      }
      val band = conjuncts.collectFirst {
        case b @ org.apache.spark.sql.catalyst.expressions.LessThanOrEqual(
            Abs(Subtract(_: AttributeReference, _: AttributeReference, _), _),
            Literal(_: Long, LongType)) => b
      }
      val rewritten = eq.zip(band).headOption.flatMap { case (eqC, bandC) =>
        val EqualTo(k1: AttributeReference, k2: AttributeReference) = eqC
        val org.apache.spark.sql.catalyst.expressions.LessThanOrEqual(
          Abs(Subtract(t1: AttributeReference, t2: AttributeReference, _), _),
          Literal(w: Long, LongType)) = bandC
        def sideOf(a: AttributeReference): Option[Boolean] =
          if (l.outputSet.contains(a)) Some(true)
          else if (r.outputSet.contains(a)) Some(false)
          else None
        val threshold = SQLConf.get.autoBroadcastJoinThreshold
        val names = l.output.map(_.name) ++ r.output.map(_.name)
        val unambiguous = names.distinct.length == names.length
        (sideOf(k1), sideOf(k2), sideOf(t1), sideOf(t2)) match {
          case (Some(ka), Some(kb), Some(ta), Some(tb))
              if ka != kb && ta != tb && w > 0 && unambiguous &&
                t1.dataType == LongType && t2.dataType == LongType &&
                threshold > 0 && r.stats.sizeInBytes <= threshold =>
            val (lk, rk) = if (ka) (k1, k2) else (k2, k1)
            val (lt, rt) = if (ta) (t1, t2) else (t2, t1)
            val core: LogicalPlan = BroadcastRangeJoinPlan(l, r,
              lk.name, lt.name, rk.name, rt.name, w, viaSizeGuard = true)
            val rest = conjuncts.filterNot(c => c.eq(eqC) || c.eq(bandC))
            Some(rest.reduceOption(And)
              .map(org.apache.spark.sql.catalyst.plans.logical
                .Filter(_, core))
              .getOrElse(core))
          case _ => None
        }
      }
      rewritten.getOrElse(j)
  }
}
