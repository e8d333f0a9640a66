package graft.queries

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

import graft.SparkSpec

/** Registry-wide OPTIMIZED-PLAN-SIZE lint (r13 VERDICT #2): the r13
  * louvain lesson — a memoized frame whose logical plan embeds the whole
  * minhash→LSH→CC tree hands every consumer a multi-thousand-node tree
  * to re-optimize per action (~30 s of pure Catalyst time on
  * vertex-sized data) — was fixed at the measured sites with lineage
  * cuts, but nothing ENFORCED the class: the next deep memoized tree
  * would regress silently until a bench caught it (and on this steal-
  * fogged host, wall-clock benches catch things late). This spec pins
  * the invariant structurally:
  *
  *   1. CEILING — every registered query's optimized logical plan stays
  *      under a fixed node budget. Plans are functions of the QUERY, not
  *      the data; a plan that needs thousands of nodes is invariably an
  *      uncut iteration/memo tree, not a genuinely complex query.
  *   2. SUB-LINEAR ACROSS SFs — the same query's plan at 10× the data
  *      must not grow materially (node count is data-independent for a
  *      healthy plan; growth across SFs means data-sized structure —
  *      e.g. per-row driver unrolling — leaked into the plan).
  *   3. CONTROL — an artificially uncut iterated self-join (the exact
  *      shape Registry.cut exists to prevent) must EXCEED the ceiling,
  *      proving the metric actually detects the blowup class.
  *
  * Ceiling calibration (measured at r14 on the full 298-query registry,
  * printed by this spec on every run): the largest healthy optimized
  * plan is tdp_fk_integrity at 183 nodes (next: tdp_ks_test 158,
  * tdp_retrieval_pipeline 155). The 600 ceiling sits ~3× above that so
  * ordinary growth never trips it, while an uncut iterated tree roughly
  * DOUBLES per round (the control below reads 380 nodes after just 6
  * rounds over a 3-node base) and blows far past it within a round or
  * two of wherever it starts.
  */
class PlanComplexitySpec extends SparkSpec {

  private val dirA = "/root/testdata/sf0.001"
  private val dirB = "/root/testdata/sf0.01"

  private def nodeCount(p: LogicalPlan): Int = {
    var n = 0
    p.foreach { node =>
      n += 1
      // Recurse into plan-bearing leaves the TreeNode walk doesn't
      // enter: cached relations carry their child plan; subqueries ride
      // expressions. LogicalRDD (a checkpoint cut) is a TRUE leaf — that
      // is the point of the cut.
      node match {
        case im: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
          n += im.cachedPlan.collect { case _ => 1 }.sum
        case _ =>
      }
      node.expressions.foreach(_.foreach {
        case sq: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
          n += nodeCount(sq.plan)
        case _ =>
      })
    }
    n
  }

  private val nodeCeiling = 600

  test("every query's optimized plan stays under the node ceiling (sf0.001)") {
    Registry.evict(spark)
    val sizes = Registry.all.map { q =>
      q.name -> nodeCount(q.fn(spark, dirA).queryExecution.optimizedPlan)
    }
    val top = sizes.sortBy(-_._2).take(8)
    info(s"largest optimized plans (sf0.001): " +
      top.map { case (n, c) => s"$n=$c" }.mkString(", "))
    val over = sizes.filter(_._2 > nodeCeiling)
    assert(over.isEmpty,
      s"optimized plans over the $nodeCeiling-node ceiling (uncut memoized " +
        s"tree? route iterated bases through Registry.cut):\n" +
        over.map { case (n, c) => s"  $n: $c nodes" }.mkString("\n"))
  }

  test("plan size is data-independent: no material growth at 10x the data") {
    val grow = Registry.all.flatMap { q =>
      val a = nodeCount(q.fn(spark, dirA).queryExecution.optimizedPlan)
      val b = nodeCount(q.fn(spark, dirB).queryExecution.optimizedPlan)
      // Slack covers AQE/statistics-driven rewrites (a broadcast-vs-SMJ
      // flip moves a handful of nodes), not structural growth.
      if (b > a * 3 / 2 + 32) Some(s"  ${q.name}: $a -> $b nodes") else None
    }
    assert(grow.isEmpty,
      s"plans grew with DATA (data-sized structure leaked into the " +
        s"plan):\n${grow.mkString("\n")}")
  }

  test("control: an uncut iterated self-join blows past the ceiling and a cut one does not") {
    import org.apache.spark.sql.functions._
    val base = Registry.table(spark, dirA, "nation")
      .select(col("n_nationkey").as("k"), col("n_regionkey").as("v"))
    // The louvain-class shape: each round joins against the previous
    // round's UNCUT frame, so the logical tree doubles-ish per round
    // (measured: 380 nodes at 6 rounds, ~1.5k at 8).
    var uncut = base
    (1 to 8).foreach { _ =>
      uncut = uncut.join(
        uncut.groupBy("v").agg(min("k").as("k2")), Seq("v"), "left")
        .select(col("k"), col("v"), coalesce(col("k2"), col("k")).as("k3"))
        .select(col("k3").as("k"), col("v"))
    }
    val blown = nodeCount(uncut.queryExecution.optimizedPlan)
    assert(blown > nodeCeiling,
      s"control failed: 8 uncut self-join rounds read only $blown nodes " +
        s"— the ceiling would not catch the blowup class")
    // Same loop THROUGH the cut: every round sees a leaf, plan stays flat.
    var cutF = Registry.cut(base)
    (1 to 8).foreach { _ =>
      cutF = Registry.cut(cutF.join(
        cutF.groupBy("v").agg(min("k").as("k2")), Seq("v"), "left")
        .select(col("k"), col("v"), coalesce(col("k2"), col("k")).as("k3"))
        .select(col("k3").as("k"), col("v")))
    }
    val flat = nodeCount(cutF.queryExecution.optimizedPlan)
    assert(flat < 20,
      s"cut control failed: cut rounds should stay leaf-sized, read $flat")
  }
}
