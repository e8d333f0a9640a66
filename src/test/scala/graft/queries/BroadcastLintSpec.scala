package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.GraftPlanBridge
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.columnar.{InMemoryRelation, InMemoryTableScanExec}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Registry-wide BROADCAST-BUILD lint — the r13 closure of the class of
  * scale-killer that hid in `ea_fuzzy_match` for four rounds: a build
  * side that our own code FORCES to the driver/broadcast regardless of
  * size. Spark's planner-chosen BroadcastHashJoins are already guarded
  * by size statistics (and re-planned by AQE), so the lint polices only
  * the sites where we overrule that machinery:
  *
  *   - `broadcast()`-hinted join sides (visible as join hints in the
  *     optimized logical plan), and
  *   - the native `BroadcastRangeJoinPlan` / `BroadcastAsOfJoinPlan`
  *     nodes, which ALWAYS collect their build side — except when the
  *     node carries `viaSizeGuard = true`, i.e. it was produced by
  *     `RewriteRangeJoin` whose autoBroadcastJoinThreshold check already
  *     proved the build broadcastable (the ea_fuzzy_match fix).
  *
  * Every such build must be one of the BLESSED BOUNDED SHAPES, checked
  * structurally on the plan:
  *   - a driver-created frame (`LocalRelation` / `OneRowRelation`) —
  *     RangeRank offsets, census tables, bucket grids;
  *   - a GLOBAL aggregate (no grouping keys → 1 row). A KEYED aggregate
  *     is NOT structurally blessed (its output is keyspace-sized, and
  *     structure cannot distinguish groupBy(tax_code) from
  *     groupBy(doc_id) — the latter is data-sized, same class as the
  *     bare-DISTINCT ea_fuzzy_match bug); keyed aggregates over
  *     unbounded children prove boundedness empirically below;
  *   - a LIMIT / top-k head;
  *   - a scan of a fixed dimension table (`nation`, `region` — the only
  *     two testdata tables whose size does not grow with SF);
  *   - a join/union ALL of whose inputs are blessed;
  *   - a cached frame whose cached plan is blessed (recursed).
  *
  * A build that is NOT structurally blessed must prove boundedness
  * EMPIRICALLY: its row count at sf0.01 (10x the data) may not exceed
  * 3x its sf0.001 count (+64 rows of slack) — linear, data-sized builds
  * grow ~10x and fail loudly. The only adjudicated exception is the
  * pair of native-operator DEMO queries (`q35_range_join_native`,
  * `q36_asof_native`), whose builds are events-derived BY DESIGN: they
  * exist to demonstrate the physical operator, SCALING.md states the
  * applicability rule (build must fit an executor), and each shares its
  * oracle with a shuffle-based twin (q24's bucketed rewrite, q14's
  * window as-of), so switching off broadcast is semantics-free. For
  * those two the lint still asserts an absolute gate-SF ceiling so the
  * demo build cannot silently become huge.
  */
class BroadcastLintSpec extends SparkSpec {

  private val dirA = "/root/testdata/sf0.001"
  private val dirB = "/root/testdata/sf0.01"

  /** The two native-operator demonstration queries (see class doc). */
  private val operatorDemos = Set("q35_range_join_native", "q36_asof_native")
  private val demoCeiling = 1000000L

  private val blessedDims = Set("nation", "region")

  private def isBlessedDimScan(paths: Seq[org.apache.hadoop.fs.Path]): Boolean =
    paths.nonEmpty && paths.forall(p =>
      blessedDims.exists(d => p.toString.endsWith(s"/$d.parquet")))

  private def boundedPhys(p: SparkPlan): Boolean = p match {
    case a: AdaptiveSparkPlanExec => boundedPhys(a.executedPlan)
    case s: InMemoryTableScanExec => boundedPhys(s.relation.cachedPlan)
    case a: BaseAggregateExec => a.groupingExpressions.isEmpty ||
      boundedPhys(a.children.head)
    case s: org.apache.spark.sql.execution.FileSourceScanExec =>
      isBlessedDimScan(s.relation.location.rootPaths)
    case _: org.apache.spark.sql.execution.LocalTableScanExec => true
    case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
    case _: org.apache.spark.sql.execution.GlobalLimitExec => true
    case _: org.apache.spark.sql.execution.LocalLimitExec => true
    case l if l.children.isEmpty => false
    case other => other.children.forall(boundedPhys)
  }

  private def bounded(p: LogicalPlan): Boolean = p match {
    case _: LocalRelation | _: OneRowRelation => true
    case _: GlobalLimit | _: LocalLimit => true
    // A GLOBAL aggregate (no grouping keys) is 1-row — always bounded. A
    // keyed aggregate is only as bounded as its KEY SPACE, which the
    // structure cannot see (groupBy(doc_id).agg(...) is data-sized, the
    // same scale class as the old ea_fuzzy_match DISTINCT; r13 ADVICE),
    // so a keyed aggregate over an unbounded child routes to the
    // empirical sf0.001→sf0.01 growth check like any other build.
    case a: Aggregate => a.groupingExpressions.isEmpty || bounded(a.child)
    case im: InMemoryRelation => boundedPhys(im.cachedPlan)
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => isBlessedDimScan(fs.location.rootPaths)
      case _ => false
    }
    case j: Join => bounded(j.left) && bounded(j.right)
    case u: Union => u.children.forall(bounded)
    case u: UnaryNode => bounded(u.child)
    case _ => false
  }

  /** Every forced-broadcast build subtree in `df`'s optimized plan, in
    * deterministic traversal order (so the sf0.001 and sf0.01 plans of
    * one query pair up positionally).
    */
  private def forcedBuilds(df: DataFrame): Seq[(String, LogicalPlan)] = {
    val out = Seq.newBuilder[(String, LogicalPlan)]
    df.queryExecution.optimizedPlan.foreach {
      case j: Join =>
        if (j.hint.leftHint.exists(_.strategy.isDefined))
          out += (("hint-left", j.left))
        if (j.hint.rightHint.exists(_.strategy.isDefined))
          out += (("hint-right", j.right))
      case r: graft.plans.BroadcastRangeJoinPlan if !r.viaSizeGuard =>
        out += (("native-range", r.right))
      case a: graft.plans.BroadcastAsOfJoinPlan =>
        out += (("native-asof", a.right))
      case _ =>
    }
    out.result()
  }

  private def count(p: LogicalPlan): Long =
    GraftPlanBridge.ofRows(spark, p).count()

  test("lint control: a corpus-sized DISTINCT build is flagged, bounded shapes are not") {
    // The exact shape of the pre-r13 ea_fuzzy_match bug: DISTINCT over
    // the full cleaned Matrix table as a forced-broadcast build. The
    // structural classifier must refuse it (distinct keeps data-sized
    // cardinality) and the growth check must catch it (10x data -> ~10x
    // rows).
    val mat = Testdata.cleanMatrix(spark, dirA)
      .select(concat_ws("|", col("plan_id"), col("ssn")).as("k"),
        (col("gross_amt") * 100).cast("long").as("cents"))
      .distinct()
    assert(!bounded(mat.queryExecution.optimizedPlan),
      "classifier blessed a corpus-sized distinct build")
    val a = count(mat.queryExecution.optimizedPlan)
    val b = count(Testdata.cleanMatrix(spark, dirB)
      .select(concat_ws("|", col("plan_id"), col("ssn")).as("k"),
        (col("gross_amt") * 100).cast("long").as("cents"))
      .distinct().queryExecution.optimizedPlan)
    assert(b > 3 * a + 64, s"growth check missed a data-sized build: $a -> $b")
    // A DATA-KEYED aggregate — groupBy over a per-row id — is the same
    // scale class dressed as an aggregate (r13 ADVICE: the old
    // classifier blessed ANY Aggregate with agg functions). It must be
    // structurally refused and empirically caught.
    def keyedAgg(dir: String) = Testdata.cleanMatrix(spark, dir)
      .groupBy("plan_id", "ssn", "transaction_id")
      .agg(org.apache.spark.sql.functions.sum("gross_amt").as("g"))
    assert(!bounded(keyedAgg(dirA).queryExecution.optimizedPlan),
      "classifier blessed a data-keyed aggregate")
    val ka = count(keyedAgg(dirA).queryExecution.optimizedPlan)
    val kb = count(keyedAgg(dirB).queryExecution.optimizedPlan)
    assert(kb > 3 * ka + 64,
      s"growth check missed a data-keyed aggregate: $ka -> $kb")
    // Blessed shapes stay blessed: a GLOBAL aggregate (1 row) and a
    // driver-created frame. A keyspace-keyed aggregate is no longer
    // structurally blessed but sails through the growth check.
    val glob = Testdata.cleanMatrix(spark, dirA)
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
    assert(bounded(glob.queryExecution.optimizedPlan),
      "classifier refused a global aggregate")
    def keyspace(dir: String) = Testdata.cleanMatrix(spark, dir)
      .groupBy("tax_code_1").agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
    assert(!bounded(keyspace(dirA).queryExecution.optimizedPlan),
      "classifier structurally blessed a keyed aggregate")
    val sa = count(keyspace(dirA).queryExecution.optimizedPlan)
    val sb = count(keyspace(dirB).queryExecution.optimizedPlan)
    assert(sb <= 3 * sa + 64,
      s"keyspace aggregate should pass the growth check: $sa -> $sb")
    import spark.implicits._
    assert(bounded(Seq((1, 2)).toDF("a", "b").queryExecution.optimizedPlan),
      "classifier refused a LocalRelation")
  }

  test("no registered query forces a broadcast of an unbounded build side") {
    val offenders = Seq.newBuilder[String]
    Registry.all.foreach { q =>
      val builds = forcedBuilds(q.fn(spark, dirA))
      if (operatorDemos.contains(q.name)) {
        // Adjudicated demo pair: events-derived build by design; assert
        // the absolute gate ceiling instead of the growth bound.
        builds.foreach { case (kind, b) =>
          val n = count(b)
          if (n > demoCeiling)
            offenders += s"${q.name}[$kind]: demo build $n > $demoCeiling"
        }
      } else {
        val unblessed = builds.zipWithIndex.filterNot { case ((_, b), _) => bounded(b) }
        if (unblessed.nonEmpty) {
          // Growth check: pair the same build positionally at 10x data.
          val buildsB = forcedBuilds(q.fn(spark, dirB))
          if (buildsB.size != builds.size)
            offenders += s"${q.name}: plan shape differs across SFs " +
              s"(${builds.size} vs ${buildsB.size} forced builds)"
          else unblessed.foreach { case ((kind, b), i) =>
            val nA = count(b)
            val nB = count(buildsB(i)._2)
            if (nB > 3 * nA + 64)
              offenders += s"${q.name}[$kind]: build grows $nA -> $nB at 10x data"
          }
        }
      }
    }
    val bad = offenders.result()
    assert(bad.isEmpty, s"unbounded forced-broadcast builds:\n${bad.mkString("\n")}")
  }
}
