package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engines.{AgeTaxCode, MatchPlanId}

/** Plan-quality assertions: the properties that matter at 100 TB — filters
  * reaching the parquet scan, small dimensions broadcast, codegen spans —
  * checked against the actual physical plans.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q3: filter and projection push down to the parquet scan") {
    val df = Registry.queries("q3_filter_pushdown")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull"), plan.take(3000))
    // Only the referenced columns reach the scan.
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("l_extendedprice"), "unused column not pruned")
  }

  test("Engine A: scope filter below the join; full outer = sort-merge") {
    val df = MatchPlanId.reconcile(
      Testdata.cleanRelius(spark, dir), Testdata.cleanMatrix(spark, dir))
    val plan = df.queryExecution.executedPlan.toString
    // Full-outer joins cannot broadcast a build side in Spark; the correct
    // scale plan is SMJ over two ALREADY plan-scope-filtered inputs.
    assert(plan.contains("SortMergeJoin") && plan.contains("FullOuter"),
      plan.take(3000))
    assert(plan.contains("IN (300004PLAT,300004MBD,300004MBDII)"),
      "plan-scope filter not pushed below the join")
  }

  test("Engine B: demographics dimension joins via broadcast") {
    val df = AgeTaxCode.run(
      Testdata.cleanMatrix(spark, dir), Testdata.cleanDemo(spark, dir))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q1: aggregation runs with map-side partial aggregation in codegen") {
    val df = Registry.queries("q1_agg")(spark, dir)
    df.collect() // finalize THIS frame's adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan.take(2000))
    assert(plan.contains("WholeStageCodegen") || plan.contains("*(1)"),
      "aggregation not codegen'd") // "*(N)" prefix = codegen stage
    // partial + final pair around the exchange
    assert("HashAggregate".r.findAllIn(plan).size >= 2, "no partial aggregation")
  }

  test("engine pipelines read only needed columns from orders") {
    val df = Testdata.cleanBasis(spark, dir)
    val scan = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    // basis derives from o_orderkey/o_custkey only (plan/ssn/year/total are
    // pure functions of the two keys).
    assert(!scan.contains("o_orderdate") && !scan.contains("o_orderpriority"),
      scan)
  }

  test("TDP base frames prune their scans before the spreading shuffle") {
    // The memoized shingle-hash / embedding-norm frames repartition before
    // the interpreted lambda work; the scan under that exchange must carry
    // only the needed columns (shuffling lang/n_chars/label bytes at
    // 100 TB corpus scale would be pure waste).
    val fp = Registry.queries("tdp_fingerprint")(spark, dir)
    val plan = fp.queryExecution.executedPlan.toString
    assert(!plan.contains("lang") && !plan.contains("n_chars"),
      plan.linesIterator.filter(_.contains("ReadSchema")).mkString("\n"))
    val nd = Registry.queries("tdp_embedding_near_dup")(spark, dir)
    val plan2 = nd.queryExecution.executedPlan.toString
    assert(!plan2.contains("label"),
      plan2.linesIterator.filter(_.contains("ReadSchema")).mkString("\n"))
  }

  test("pii scan is a single pass: no exchange anywhere in the plan") {
    val df = Registry.queries("tdp_pii_scan")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(3000))
    // "*(1)" is the whole-stage-codegen marker in the compact plan string.
    assert(plan.trim.startsWith("*("), "regex scan should codegen")
  }

  test("q30 de-correlates to a shuffle join — no nested loop, no cartesian") {
    val df = Registry.queries("q30_correlated_agg")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("tfidf attaches the corpus size as a broadcast, never a shuffle") {
    val df = Registry.queries("tdp_tfidf_topterms")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // The 1-row corpus-count frame must come in via a broadcast join (a
    // nested-loop against one broadcast row is the correct plan); the
    // (doc, term) tf aggregation still shuffles on its keys.
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan.take(3000))
  }

  test("source mix: only equi-joins — no cartesian, no nested loop") {
    val df = Registry.queries("tdp_source_mix")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // Five joins (doc_id x4, cluster_id root-provenance attach) must all
    // plan as hash/sort-merge equi-joins: a nested loop here would be
    // corpus x corpus at 100 TB.
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("semdedup: within-cluster pairing is a cluster-keyed equi-join") {
    val df = Registry.queries("tdp_semdedup")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // The pairwise stage must shuffle on `cluster` (the paper's O(N^2/k)
    // bill, bounded by cell size) — a shuffled cartesian here would be
    // corpus x corpus. The only non-equi join allowed is the documented
    // vectors x broadcast-centroids assignment crossJoin.
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("multi-probe recall: probe fan-out joins stay equi-keyed") {
    val df = Registry.queries("tdp_ann_recall_nprobe")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // The bucket searches join on `cluster` and the hit counts meet the
    // 1-row totals via broadcast; the only non-equi join allowed is the
    // documented vectors x broadcast-centroids assignment crossJoin and
    // the brute-force truth's broadcast(q) != join — both broadcast-
    // bounded, never a shuffled cartesian.
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("ivfpq: candidate generation is cell-keyed; ADC table broadcasts") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.joins._
    // The composed IVF->PQ search subtree (routing + ADC scoring) must be
    // pure equi-joins: cells on `cluster`, codes on `c_id`, the ADC
    // lookup on (q_id, m, code_id) via broadcast. A nested loop or
    // cartesian anywhere here is corpus-scale at 100 TB. The memoized
    // frames plan as InMemoryTableScan leaves whose toString RENDERS
    // their cached child plans (including the documented vectors x
    // broadcast-centroids assignment crossJoin), so collect real join
    // nodes instead of string-matching: unwrap the df's own cache entry,
    // stop at deeper cache boundaries.
    def searchJoins(df: org.apache.spark.sql.DataFrame): Seq[BaseJoinExec] = {
      def deAdaptive(p: SparkPlan): SparkPlan = p match {
        case a: AdaptiveSparkPlanExec => a.inputPlan
        case o => o
      }
      val p0 = deAdaptive(df.queryExecution.executedPlan)
      val inner = p0.collectFirst {
        case s: InMemoryTableScanExec => deAdaptive(s.relation.cachedPlan)
      }.getOrElse(p0)
      inner.collect { case j: BaseJoinExec => j }
    }
    val topJoins = searchJoins(TdpQueries.ivfPqTop3(spark, dir))
    val cellJoins = searchJoins(TdpQueries.ivfPqCells(spark, dir))
    assert(topJoins.nonEmpty && cellJoins.nonEmpty)
    assert((topJoins ++ cellJoins).forall(j =>
      !j.isInstanceOf[CartesianProductExec] &&
        !j.isInstanceOf[BroadcastNestedLoopJoinExec]),
      (topJoins ++ cellJoins).mkString("\n"))
    // The ADC lookup table must attach via broadcast hash join.
    assert(topJoins.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      topJoins.mkString("\n"))
  }

  test("budget select: offsets broadcast; no global single-partition sort") {
    val df = Registry.queries("tdp_budget_select")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // The P-row cumulative-offset frame must attach via broadcast (a
    // shuffle join keyed on pid would defeat the device), and the prefix
    // sum must run as per-partition windows — never a `WindowExec` with
    // no partitioning (the single-partition global-sort trap).
    assert(plan.contains("BroadcastExchange"), plan.take(3000))
    assert(!plan.contains("Window Partition: []") &&
      !plan.contains("SinglePartition, Window"), plan.take(3000))
  }

  test("importance resampling: the 64-row bucket table attaches via broadcast") {
    val df = Registry.queries("tdp_importance_resample")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // The log-ratio table is feature-bucket-sized (64 rows) — shuffling
    // the corpus token stream against it on `b` would be a full exchange
    // of every token row; the correct plan broadcasts the table.
    assert(plan.contains("BroadcastExchange"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("vocab top-k plans as TakeOrdered, never a global sort of the vocab") {
    val df = Registry.queries("tdp_vocab_topk")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // orderBy + limit must fuse into TakeOrderedAndProject (per-partition
    // top-k then a k-sized driver merge) — a full Sort + GlobalLimit would
    // funnel the whole vocabulary through one partition at 100 TB.
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
  }

  test("split leakage: cluster-keyed equi-joins only") {
    val df = Registry.queries("tdp_split_leakage")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("bloom dedup: probe filters BELOW the verify semi-join, equi-joins only") {
    val df = Registry.queries("tdp_bloom_dedup")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // The sketch probe must appear as a plain Filter in the plan (inside
    // codegen, not a UDF) — that is the prefilter that lets misses skip
    // the verification join entirely.
    assert(plan.contains("graft_bloom_contains"), plan.take(3000))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    // And it must sit on the join's streamed input, not above the join:
    // every semi-join subtree that contains the probe filter proves the
    // filter ran first. Collect over the pre-AQE plan — executedPlan is
    // an AdaptiveSparkPlanExec leaf that hides the join nodes.
    val joins = df.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
          if j.toString.contains("LeftSemi") => j
    }
    assert(joins.nonEmpty, "verification semi-join missing")
    assert(joins.exists(_.left.toString.contains("graft_bloom_contains")),
      joins.map(_.toString.take(800)).mkString("\n---\n"))
  }

  test("bucketed reconcile: full-outer SMJ with ZERO shuffle exchanges") {
    val df = Registry.queries("ea_reconcile_bucketed")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // Both catalog tables are bucketed + sorted on the exact match key,
    // so the join must read the buckets directly: any
    // `Exchange hashpartitioning` here means the layout was ignored and
    // the 100 TB co-location claim is void.
    assert(plan.contains("SortMergeJoin"), plan.take(3000))
    assert(plan.contains("Bucketed: true"), plan.take(3000))
    assert(!plan.contains("Exchange hashpartitioning"),
      "bucketed reconcile still shuffles:\n" + plan.take(3000))
  }

  test("substring dedup: inverted-index equi-joins only, no pairwise stage") {
    val df = Registry.queries("tdp_substring_dedup")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // Every join is keyed by the window hash or doc_id — the witness
    // derivation is two aggregations, never a position self-join; a
    // nested loop or cartesian here would be positions x positions at
    // 100 TB.
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("funnel: the whole per-user stage rides ONE hash exchange") {
    val df = Registry.queries("q34_funnel")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // Three min(when) windows + the per-user aggregate all partition by
    // user_id: Spark must reuse a single hashpartitioning exchange for
    // the lot (the only other exchange is the 1-row final-summary
    // SinglePartition reduce). A second hash exchange would mean the
    // funnel re-shuffles the events per step — the thing this shape
    // exists to avoid at 100 TB.
    val hashExchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(hashExchanges == 1, s"want 1 hash exchange, got $hashExchanges:\n" +
      plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
  }

  test("vocab coverage: head selection is TakeOrdered, not a global sort") {
    val df = Registry.queries("tdp_vocab_coverage")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
  }

  test("uniform sample: bottom-k-by-hash plans as TakeOrdered") {
    val df = Registry.queries("tdp_uniform_sample")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // per-partition k-heaps + a k-sized driver merge — a global Sort +
    // GlobalLimit here would funnel the corpus through one partition.
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
  }

  test("containment: prefix-filtered equi-joins only, no pairwise stage") {
    val df = Registry.queries("tdp_containment")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("filtered ANN: predicate joins stay equi-keyed on (cluster, label)") {
    val df = Registry.queries("tdp_ann_filtered")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // The label predicate must ride the bucket equi-join (a cartesian or
    // label-blind nested loop here would post-filter the whole corpus).
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("grouped top-n: heap aggregate with map-side partials, no window sort") {
    val df = Registry.queries("tdp_topk_per_group")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // The whole point of graft_topn: ObjectHashAggregate partial/final
    // (n-row buffers cross the shuffle), never a row_number window that
    // shuffles and sorts every row of every group.
    assert(plan.contains("ObjectHashAggregate"), plan.take(3000))
    assert(!plan.contains("Window"), plan.take(3000))
  }

  test("weighted sample: global top-k is TakeOrdered, not a corpus sort") {
    val df = Registry.queries("tdp_weighted_sample")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
  }

  test("hard negatives: bucket equi-join, label mismatch stays a filter") {
    val df = Registry.queries("tdp_hard_negatives")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // The broadcast-centroid crossJoin inside the memoized assignment is
    // the accepted scalar-attach shape; what must NOT appear is a
    // cartesian between query and candidate sides.
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("skew profile: top-10 mass is TakeOrdered over the key histogram") {
    val df = Registry.queries("tdp_skew_profile")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
  }

  test("star join: three broadcast dims over one pruned fact scan, no SMJ") {
    val df = Registry.queries("q34_star_join")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(bhj >= 3, s"expected 3 broadcast joins, saw $bhj:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
    // The fact scan must read only the join key and the measure.
    assert(plan.contains("l_suppkey") && plan.contains("l_quantity"))
    assert(!plan.contains("l_extendedprice"), "fact scan not pruned")
  }

  test("auto range join: declarative condition planned as the native operator") {
    val df = Registry.queries("q37_range_join_auto")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastRangeJoin"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("tokenizer fertility: vocabulary joins via broadcast, corpus unshuffled") {
    val df = Registry.queries("tdp_tokenizer_fertility")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("recursive spine: native UnionLoop recursion, counts join broadcast") {
    val df = Registry.queries("q38_recursive_spine")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("UnionLoop"), plan.take(3000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("lateral top-k: planned as WindowGroupLimit pushdown, not a loop") {
    val df = Registry.queries("q39_lateral_topk")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // Spark must decorrelate the LATERAL LIMIT into the rank-limit
    // pushdown (per-partition top-k before the full window sort) — a
    // nested loop re-executing the subquery per outer row would be the
    // scale-killer formulation.
    assert(plan.contains("WindowGroupLimit"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("unpivot: metadata-only Expand, scan pruned to the two columns") {
    val df = Registry.queries("q40_unpivot")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), plan.take(3000))
    assert(!plan.contains("o_totalprice"), "unused fact columns not pruned")
  }

  test("triangle count: wedge and closing joins stay equi-keyed, no pair scan") {
    val df = Registry.queries("tdp_triangle_count")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // The degree-ordered construction must plan as keyed joins only:
    // a CartesianProduct or nested loop would mean the O(m^1.5) wedge
    // bound silently degraded to all-pairs.
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("pareto frontier: only broadcast-bounded nested loops, never cartesian") {
    val df = Registry.queries("tdp_pareto_frontier")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // The dominance checks are inherently non-equi: they are legal ONLY
    // because both inputs are bounded (<=512-cell summary; skyline-sized
    // candidates) and explicitly broadcast. A CartesianProduct would mean
    // a corpus-sized side slipped into the pairwise stage.
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("span corruption: pure per-row projection — no joins, no aggregates") {
    val df = Registry.queries("tdp_span_corruption")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // No joins, no aggregates: everything is a per-row expression. (The
    // only Exchange in the lineage is docToks' one memoized repartition,
    // whose plan string count varies with the cache's state — assert the
    // operator mix, not the string count.)
    assert(!plan.contains("Join") && !plan.contains("Aggregate"),
      plan.take(3000))
  }

  test("fk integrity: dim orphan checks broadcast, fact side never cartesian") {
    val df = Registry.queries("tdp_fk_integrity")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // Six of the seven parent key sets are dims -> broadcast LeftAnti;
    // a CartesianProduct anywhere outside the 1-row scalar attaches
    // would mean an orphan check degenerated to all-pairs.
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("t-closeness: group/band grid is broadcast, windows group-partitioned") {
    val df = Registry.queries("tdp_t_closeness")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // The grid crossJoin multiplies two KEYSPACE-sized aggregates; both
    // band frames must arrive broadcast, and the only nested-loop joins
    // allowed are those broadcast-bounded ones.
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("No Partition Defined"), "data-sized window")
  }

  test("label propagation: rounds are equi-joins on the vertex id") {
    val df = Registry.queries("tdp_label_propagation")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // Three rounds of edges-to-labels joins: all hash-keyed, never a
    // nested loop — the Pregel shape's whole point.
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("dbscan: probe-cell candidates stay equi-keyed, never cartesian") {
    val df = Registry.queries("tdp_dbscan")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // Candidate generation is a cluster-keyed self-join of the memoized
    // probe assignment; the only nested loop in the lineage is the
    // broadcast-centroid assignment crossJoin shared with the ANN family.
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("dbscan nprobe: one verify pass, sweep fans out broadcast, no cartesian") {
    val df = Registry.queries("tdp_dbscan_nprobe")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // The 3-point sweep must ride ONE candidate join + ONE epsilon-verify
    // (filters over the shared pair frame); the nprobe fan-out is a
    // 3-row broadcast, so a CartesianProduct anywhere means a sweep
    // point degenerated to its own all-pairs pass.
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("unigram prune: DP rides broadcast score maps, no cartesian") {
    val df = Registry.queries("tdp_unigram_prune")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // r14: both Viterbi DPs are single-pass per-word aggregate
    // expressions against a broadcast 1-row piece-score map (plus 1-row
    // total-usage attaches) — broadcast nested loops of bounded frames,
    // never a cartesian of two data-sized sides, and no per-round
    // shuffle joins remain.
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("skipgram cooc: no self-join — window leads only, TakeOrdered head") {
    val df = Registry.queries("tdp_skipgram_cooc")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // The whole pair generation must be lead() columns over one
    // (doc_id, pos) window — a positional self-join would put an
    // O(len^2)-per-doc join in the plan. And the head must be a
    // TakeOrdered, never a global sort of the pair table.
    assert(!plan.contains("Join"), plan.take(3000))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
  }

  test("hits: auth side broadcasts, rounds stay equi-keyed") {
    val df = Registry.queries("tdp_hits")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // The alphabet-sized authority frame must attach via broadcast;
    // the only nested loops allowed are the broadcast-bounded 1-row
    // max-normalization attaches (the scalar crossJoin device) — a
    // cartesian anywhere is a scale bug.
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("auc/ks/chi2: stat audits keep windows bounded, no data-sized sort") {
    for (q <- Seq("tdp_auc_roc", "tdp_ks_test", "tdp_chi_square")) {
      val plan = Registry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      // Cumulative windows ride the constant-partition device over
      // alphabet-sized frames; an unpartitioned window over corpus
      // rows would print 'No Partition Defined'.
      assert(!plan.contains("No Partition Defined"), s"$q: data-sized window")
      assert(!plan.contains("CartesianProduct"), s"$q: ${plan.take(1500)}")
    }
  }

  test("interval merge: one user_id exchange feeds window and aggregates") {
    val df = Registry.queries("q45_interval_merge")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // The sweep is windows + two groupBys all keyed on user_id (island
    // is a refinement): exactly ONE shuffle of the event rows.
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n" +
      plan.take(3000))
    assert(!plan.contains("Join"), plan.take(3000))
  }

  test("theil-sen/changepoint: per-type windows only, no join, no global sort") {
    for (q <- Seq("q47_theil_sen", "q48_changepoint")) {
      val plan = Registry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      // Everything after the daily count is calendar-bounded per
      // event_type: a join or an unpartitioned window anywhere means the
      // pairwise stage escaped the packed-list device.
      assert(!plan.contains("Join"), s"$q: ${plan.take(2000)}")
      assert(!plan.contains("No Partition Defined"),
        s"$q: data-sized window")
    }
  }

  test("kcore: peel trace is seven 1-row censuses, no cartesian") {
    val df = Registry.queries("tdp_kcore")(spark, dir)
    // The rounds run at build time behind lineage cuts; what remains
    // must be the union of 1-row censuses (7 rows), with no cartesian
    // anywhere in the residual plan.
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(df.count() == 7)
  }

  test("textrank: TakeOrdered head over keyed rounds, no cartesian") {
    val df = Registry.queries("tdp_textrank")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // Power rounds are equi-joins on token keys; the head must be a
    // TakeOrdered(20), never a global sort of the vocabulary.
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("quantile norm: histogram probes via broadcast array, no SMJ") {
    val df = Registry.queries("tdp_quantile_norm")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // The inverse-CDF probe must be the broadcast (cum, v) array inside
    // a codegen'd filter — a sort-merge join of docs against the
    // histogram (or worse, a cartesian against corpus rows) means the
    // domain-bounded device was lost.
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("covisit: alphabet-sized marginals broadcast, no cartesian") {
    val df = Registry.queries("tdp_covisit_lift")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("burstiness: stitched windows, partial aggregation, no cartesian") {
    val df = Registry.queries("tdp_burstiness")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // Gaps must come from (type, day)-keyed windows — high-cardinality
    // partitioning — never a type-only global sort; the moment sums must
    // map-side combine.
    assert(plan.contains("partial"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("mutual info: margins broadcast, no cartesian") {
    val df = Registry.queries("tdp_mutual_info")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("edit dedup: pair-keyed equi-joins only, no cartesian") {
    val df = Registry.queries("tdp_edit_dedup")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("bfs reach: bounded hop census rows") {
    val df = Registry.queries("tdp_bfs_reach")(spark, dir)
    // The walk runs at build time (1-row count hops); the returned frame
    // is the <=5-row hop census.
    assert(df.count() <= 5)
  }

  test("threshold sweep: 3-row census, shared pair frame, no cartesian") {
    val df = Registry.queries("tdp_threshold_sweep")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(df.count() == 3)
  }

  test("markov stationary: alphabet-sized rounds, no cartesian") {
    val df = Registry.queries("tdp_markov_stationary")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("vocab growth: 10-row census, offset-device ranks, no cartesian") {
    val df = Registry.queries("tdp_vocab_growth")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(df.count() == 10)
  }

  test("session entropy: partial aggregation, no cartesian") {
    val df = Registry.queries("tdp_session_entropy")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("curriculum: broadcast weights, TakeOrdered head, no cartesian") {
    val df = Registry.queries("tdp_curriculum_interleave")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrdered"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(df.count() <= 24)
  }

  test("epoch plan: alphabet-sized output, no cartesian") {
    val df = Registry.queries("tdp_epoch_plan")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("assortativity: 1-row moments, vertex-keyed joins, no cartesian") {
    val df = Registry.queries("tdp_assortativity")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(df.count() == 1)
  }

  test("audience overlap: broadcast marginals, no cartesian") {
    val df = Registry.queries("tdp_audience_overlap")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("transitivity: 1-row result, joinless wedge moment, no cartesian") {
    val df = Registry.queries("tdp_transitivity")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(df.count() == 1)
  }

  test("emb outliers: memoized assignment, bounded histogram") {
    val df = Registry.queries("tdp_emb_outliers")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(df.count() <= 2001)
  }

  test("conversion latency: in-plan top-2 broadcast, no cartesian") {
    val df = Registry.queries("tdp_conversion_latency")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(df.count() <= 4)
  }

  test("quality by decile: 10-row census off the shared ranked memo") {
    val df = Registry.queries("tdp_quality_by_decile")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(df.count() <= 10)
  }

  test("dedup savings: 1-row reduce off the memoized cluster frame") {
    val df = Registry.queries("tdp_dedup_savings")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(df.count() == 1)
  }

  test("ivf balance: 1-row reduce off the memoized assignment") {
    val df = Registry.queries("tdp_ivf_balance")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(df.count() == 1)
  }

  test("cluster purity: 1-row summary off the memoized cluster frame") {
    val df = Registry.queries("tdp_cluster_purity")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(df.count() == 1)
  }

  test("hapax share: vocab-bounded joins, partial aggregation") {
    val df = Registry.queries("tdp_hapax_share")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("length-quality slope: 1-row moment reduce, no cartesian") {
    val df = Registry.queries("tdp_len_quality_slope")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(df.count() == 1)
  }

  test("set cover: K-row result, rounds behind lineage cuts") {
    val df = Registry.queries("tdp_set_cover")(spark, dir)
    // The greedy walk runs at build time (1-row argmax hops); the
    // returned frame is the K-row trace.
    assert(df.count() == 5)
  }

  test("pca power: one distributed moment pass, D^2-bounded driver state") {
    val df = Registry.queries("tdp_pca_power")(spark, dir)
    // The returned frame is the driver-built component table: 64 rows.
    assert(df.count() == 64)
    // The distributed part is the moment aggregate; assert its shape
    // directly — a partial_sum under the final HashAggregate means
    // map-side combine keeps the shuffle at D^2 rows per partition.
    val moments = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id",
        "transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS m")
      .selectExpr("m", "posexplode(m) AS (i, mi)")
      .selectExpr("i", "mi", "posexplode(m) AS (j, mj)")
      .groupBy("i", "j").agg(sum(expr("CAST(mi * mj AS DECIMAL(38,0))")))
    val mplan = moments.queryExecution.executedPlan.toString
    assert(mplan.contains("HashAggregate") &&
      mplan.contains("partial"), mplan.take(3000))
  }

  test("ann beam: residual census only, no cartesian, 3-hop trace") {
    val df = Registry.queries("tdp_ann_beam")(spark, dir)
    // The hop expansions run at build time behind per-hop lineage cuts
    // (the kcore pattern) — what remains is the per-hop census over the
    // checkpointed pools; the only nested loops allowed are the 1-row
    // census attaches, and a cartesian anywhere means a census
    // degenerated to all-pairs.
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(df.count() == 3)
  }

  test("dedup pipeline: residual audit is semi-joins, censuses broadcast") {
    val df = Registry.queries("tdp_dedup_pipeline")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // The no-surviving-pair certificate must probe the pair frame with
    // two LeftSemi joins against the keeper set; the five 1-row censuses
    // attach broadcast; nothing may go cartesian.
    assert(plan.contains("LeftSemi"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("containment and hard negatives stay pair/bucket equi-keyed") {
    for (q <- Seq("tdp_shingle_containment", "tdp_nondup_negatives")) {
      val plan = Registry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      // Containment joins hash arrays onto the memoized pair frame by
      // doc id; hard negatives joins candidates by IVF bucket — a
      // cartesian anywhere means an all-pairs pass escaped.
      assert(!plan.contains("CartesianProduct"), s"$q: ${plan.take(2000)}")
    }
  }

  test("retrieval pipeline: lexical head is TakeOrdered, censuses broadcast") {
    val df = Registry.queries("tdp_retrieval_pipeline")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // The BM25 top-10 head must plan as TakeOrdered (never a global
    // sort of the lexical scores); the five 1-row censuses attach via
    // broadcast; nothing may go cartesian.
    assert(plan.contains("TakeOrdered"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("louvain round: vertex/community equi-joins only, no cartesian") {
    val df = Registry.queries("tdp_louvain_round")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // The gain computation is equi-joins on doc_id/community keys over
    // the memoized pair frame; the only nested loops allowed are the
    // 1-row m2/Q census attaches.
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("incremental ANN: cell-keyed search, bounded broadcasts, no cartesian") {
    val df = Registry.queries("tdp_ann_incremental")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // The assignment pass broadcasts the 64-centroid frame (a Limit —
    // structurally bounded, BroadcastLintSpec-blessed); the IVF search
    // is a cluster-keyed equi-join; the truth leg broadcasts the BATCH
    // as the query set (batch-sized, the exactTop5 contract). Nothing
    // may plan a shuffled CartesianProduct.
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("release pipeline: doc-keyed gate joins, no cartesian") {
    val df = Registry.queries("tdp_release_pipeline")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // The decontamination gate must probe with semi/anti joins on the
    // doc/hash keys; the only nested loops allowed are the 1-row census
    // attaches.
    assert(plan.contains("LeftAnti") || plan.contains("LeftSemi"),
      plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("fuzzy match: broadcast only under the size guard, shuffle fallback") {
    // The r12 weak finding: ea_fuzzy_match fed the full distinct Matrix
    // frame to BroadcastRangeJoinExec unconditionally — a driver-side
    // collect of a corpus-sized build at 100 TB. The fix spells the band
    // join declaratively, so RewriteRangeJoin's autoBroadcastJoinThreshold
    // guard decides the plan. This test proves BOTH sides of that guard:
    // with the default threshold the tiny sf0.001 build broadcasts to the
    // native operator; with broadcast disabled the SAME query plans a
    // shuffled equi-join on the plan|ssn key (band as post-join filter,
    // per-participant groups are tiny) — and the two plans agree on the
    // result, so the switch is semantics-free.
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    val broadcastPlan = Registry.queries("ea_fuzzy_match")(spark, dir)
    val bStr = broadcastPlan.queryExecution.executedPlan.toString
    assert(bStr.contains("BroadcastRangeJoin"), bStr.take(2000))
    val expected = broadcastPlan.count()
    try {
      spark.conf.set(key, "-1")
      val shuffled = Registry.queries("ea_fuzzy_match")(spark, dir)
      val sStr = shuffled.queryExecution.executedPlan.toString
      assert(!sStr.contains("BroadcastRangeJoin"),
        s"size guard ignored broadcast disable: ${sStr.take(2000)}")
      assert(!sStr.contains("BroadcastNestedLoopJoin") &&
        !sStr.contains("CartesianProduct"), sStr.take(2000))
      assert(sStr.contains("SortMergeJoin") ||
        sStr.contains("ShuffledHashJoin"), sStr.take(2000))
      assert(shuffled.count() == expected,
        "broadcast and shuffle plans disagree")
    } finally spark.conf.set(key, saved)
  }
}
