package graft.queries

import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Registry-wide window-plan lint: no query may plan a `Window` whose
  * partitionSpec is empty or all-foldable — Spark's `WindowExec` then
  * funnels the ENTIRE frame through one task (the "No Partition Defined"
  * warning), the canonical 100 TB scale-killer. Bounded-frame global
  * windows must ride the non-foldable constant-partition device
  * (`pmod(col, lit(1L))`), and data-sized ranks must use the shared
  * [[RangeRank]] range-partition + offset device. Nothing is whitelisted:
  * a new query that trips this lint either bounds its frame through the
  * pmod device (and documents WHY the frame is bounded) or ranks through
  * RangeRank.
  */
class WindowLintSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def singleTaskWindows(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
    plan.collect {
      case w: LogicalWindow if w.partitionSpec.forall(_.foldable) => w
    }

  test("lint control: a foldable constant partition key reads as single-task") {
    import spark.implicits._
    val bad = Seq(1, 2, 3).toDF("x").withColumn("rn",
      row_number().over(Window.partitionBy(lit(0)).orderBy("x")))
    assert(singleTaskWindows(bad.queryExecution.optimizedPlan).nonEmpty,
      "control: lint failed to flag Window.partitionBy(lit(0))")
    val good = Seq(1, 2, 3).toDF("x").withColumn("rn",
      row_number().over(
        Window.partitionBy(pmod(col("x"), lit(1L))).orderBy("x")))
    assert(singleTaskWindows(good.queryExecution.optimizedPlan).isEmpty,
      "control: lint wrongly flags the pmod constant-partition device")
  }

  test("registry names are unique — a duplicate silently shadows a query") {
    // Registry.queries/oracles are Maps built from Registry.all: a
    // second QueryDef with an existing name replaces the first one's fn
    // AND oracle without any error, so the shadowed operator silently
    // loses its correctness row.
    val dups = Registry.all.map(_.name)
      .groupBy(identity).filter(_._2.size > 1).keys.toSeq.sorted
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
  }

  test("no registered query plans a single-task window or a cartesian") {
    // One pass over EVERY registered query: (a) no Window with an
    // empty/all-foldable partitionSpec (the single-task funnel), and
    // (b) no CartesianProduct in the physical plan — 1-row/keyspace
    // scalar attaches must arrive as broadcast() hints (they then plan
    // as BroadcastNestedLoopJoin, which is allowed), so a shuffled
    // cartesian anywhere is an unbounded all-pairs bug. Nothing is
    // whitelisted.
    val windowOffenders = Seq.newBuilder[String]
    val cartesianOffenders = Seq.newBuilder[String]
    Registry.all.foreach { q =>
      val df =
        try q.fn(spark, dir)
        catch {
          case e: Throwable => fail(s"${q.name}: build failed: $e")
        }
      if (singleTaskWindows(df.queryExecution.optimizedPlan).nonEmpty)
        windowOffenders += q.name
      if (df.queryExecution.executedPlan.toString.contains("CartesianProduct"))
        cartesianOffenders += q.name
    }
    val w = windowOffenders.result()
    val c = cartesianOffenders.result()
    assert(w.isEmpty,
      s"single-task (empty/foldable partitionSpec) windows in: " +
        w.mkString(", "))
    assert(c.isEmpty, s"CartesianProduct in: ${c.mkString(", ")}")
  }

  test("pmod-device windows hold BOUNDED frames — checked, not asserted") {
    // The r12 ADVICE gap: the lint above treats any non-foldable
    // partitionSpec as safe, so the pmod(col, lit(1L)) constant-partition
    // device — which still funnels its whole frame through ONE WindowExec
    // task at runtime — structurally bypasses it, and "the frame is
    // bounded" lived only in comments. This test CHECKS the claim for
    // every registered query: each window partitioned by the pmod device
    // has its child frame counted at sf0.001 and sf0.01 (10x the data) —
    // a bounded (value-domain / keyspace / P-sized) frame may not grow
    // linearly. Threshold 3x + 64 rows of slack on a 10x data bump:
    // vocab-like frames that grow with the corpus fail loudly and must
    // move to RangeRank instead.
    // In the OPTIMIZED plan the window's partition expression is
    // extracted into a `_w0` projection below the Window node, so the
    // partitionSpec itself is a bare AttributeReference — chase each
    // such attribute into the child's aliases (by exprId) and match the
    // aliased expression against the pmod(_, lit(1L)) device.
    import org.apache.spark.sql.catalyst.expressions.{Alias,
      AttributeReference, Literal, Pmod}
    def isPmodDevice(
        e: org.apache.spark.sql.catalyst.expressions.Expression,
        child: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : Boolean = e match {
      case Pmod(_, Literal(1L, org.apache.spark.sql.types.LongType), _) =>
        true
      case a: AttributeReference =>
        child.collectFirst {
          case p: org.apache.spark.sql.catalyst.plans.logical.Project
              if p.projectList.exists {
                case al: Alias if al.exprId == a.exprId =>
                  al.child match {
                    case Pmod(_, Literal(1L,
                      org.apache.spark.sql.types.LongType), _) => true
                    case _ => false
                  }
                case _ => false
              } => true
        }.getOrElse(false)
      case _ => false
    }
    def pmodWindows(
        plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      plan.collect {
        case w: LogicalWindow
            if w.partitionSpec.exists(isPmodDevice(_, w.child)) => w
      }
    val dirB = "/root/testdata/sf0.01"
    val offenders = Seq.newBuilder[String]
    var seen = 0
    Registry.all.foreach { q =>
      val winsA = pmodWindows(q.fn(spark, dir).queryExecution.optimizedPlan)
      seen += winsA.size
      if (winsA.nonEmpty) {
        val winsB = pmodWindows(q.fn(spark, dirB).queryExecution.optimizedPlan)
        if (winsA.size != winsB.size)
          offenders += s"${q.name}: pmod window count differs across SFs " +
            s"(${winsA.size} vs ${winsB.size})"
        else winsA.zip(winsB).foreach { case (wa, wb) =>
          val nA = org.apache.spark.sql.GraftPlanBridge
            .ofRows(spark, wa.child).count()
          val nB = org.apache.spark.sql.GraftPlanBridge
            .ofRows(spark, wb.child).count()
          if (nB > 3 * nA + 64)
            offenders += s"${q.name}: pmod-device window frame grows " +
              s"$nA -> $nB at 10x data — not bounded, use RangeRank"
        }
      }
    }
    val bad = offenders.result()
    assert(bad.isEmpty,
      s"unbounded single-task pmod windows:\n${bad.mkString("\n")}")
    // Vacuity guard: the registry is known to use the pmod device in
    // dozens of places — zero matches would mean the pattern above
    // silently stopped recognizing it (e.g. a Pmod signature change),
    // not that the device disappeared.
    assert(seen >= 10, s"pmod-device pattern matched only $seen windows " +
      "registry-wide — the lint has gone blind, fix the pattern")
  }

  test("per-source ranks never ride a bare low-cardinality source window") {
    // The r11 scale funnel: row_number over Window.partitionBy("source")
    // puts every row of a mega-source through ONE WindowExec task. Both
    // fixed queries must rank through RangeRank's (partition-id, source)
    // windows instead — no Window in their lineage may be partitioned by
    // the source key alone.
    for (q <- Seq("tdp_quantile_norm", "tdp_curriculum_interleave",
      "tdp_source_percentiles")) {
      val plan = Registry.queries(q)(spark, dir).queryExecution.optimizedPlan
      val bare = plan.collect {
        case w: LogicalWindow
            if w.partitionSpec.size == 1 &&
              w.partitionSpec.head.references.map(_.name).toSet ==
              Set("source") =>
          w
      }
      assert(bare.isEmpty, s"$q: window partitioned by bare source key")
    }
  }
}
