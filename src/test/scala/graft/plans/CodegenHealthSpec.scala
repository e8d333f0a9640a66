package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{CollapseCodegenStages, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.debug.codegenStringSeq

import graft.SparkSpec
import graft.queries.Testdata

/** Regression guard for the janino 64 KB method-limit failure mode: a
  * collapsed projection whose generated `processNext()` exceeds the JVM
  * method limit makes Spark attempt the compile for tens of seconds and
  * then SILENTLY run the stage interpreted (observed on Engine C before
  * its masks were staged into columns, and on Engine D in round 1).
  * This spec compiles every WholeStageCodegen subtree of each engine
  * pipeline up front and fails loudly if any subtree does not produce
  * valid bytecode or any generated method approaches the 64 KB limit.
  */
class CodegenHealthSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def assertAllSubtreesCompile(name: String, build: => DataFrame): Unit = {
    // AQE defers stage planning, so the pre-execution plan carries no
    // WholeStageCodegen subtrees to compile; turn it off for the health
    // check (the generated code is identical either way).
    val s = spark
    val prev = s.conf.get("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    // Memoized (persisted) frames plan as a bare InMemoryTableScan with no
    // codegen subtree of their own — the real pipeline lives in the cached
    // relation's physical plan, so recurse through every cache boundary.
    // A frame that was MATERIALIZED while AQE was on caches an
    // AdaptiveSparkPlanExec, which is a leaf to collect() and hides its
    // codegen subtrees — unwrap it too, or this spec's result depends on
    // which suite touched the memo first (observed: minhash/ivf guards
    // failing only when PlanSpec ran before this one).
    def throughCaches(p: SparkPlan): Seq[SparkPlan] = {
      val base = p match {
        // An UNEXECUTED adaptive plan (a memo frame another suite built
        // but never ran) has no WholeStageCodegen nodes at all — AQE
        // inserts them per stage at execution — so apply Spark's own
        // collapse rule to get the codegen view this spec must compile.
        case a: AdaptiveSparkPlanExec =>
          val inner = a.executedPlan
          if (inner.find(_.isInstanceOf[WholeStageCodegenExec]).isDefined) inner
          else CollapseCodegenStages().apply(inner)
        case other => other
      }
      base +: base.collect {
        case scan: InMemoryTableScanExec =>
          throughCaches(scan.relation.cachedPlan)
        case a: AdaptiveSparkPlanExec => throughCaches(a)
        // An executed adaptive plan replaces its stages with
        // QueryStageExec leaves; the codegen subtrees live in .plan.
        case qs: QueryStageExec => throughCaches(qs.plan)
      }.flatten
    }
    val subtrees =
      try throughCaches(build.queryExecution.executedPlan)
        .flatMap(codegenStringSeq)
      finally s.conf.set("spark.sql.adaptive.enabled", prev)
    assert(subtrees.nonEmpty, s"$name: no WholeStageCodegen subtree at all")
    subtrees.foreach { case (subtree, _, stats) =>
      assert(stats.maxMethodCodeSize > 0,
        s"$name: a WholeStageCodegen subtree failed to compile " +
          s"(stats unavailable) — likely over the 64 KB method limit:\n$subtree")
      assert(stats.maxMethodCodeSize < 60000,
        s"$name: generated method is ${stats.maxMethodCodeSize} bytes — " +
          s"within 10% of janino's 64 KB limit, one rule away from " +
          s"interpreted fallback:\n$subtree")
    }
  }

  test("Engine A reconcile plan stays fully codegen'd") {
    assertAllSubtreesCompile("engineA",
      graft.engines.MatchPlanId.reconcile(
        Testdata.cleanRelius(spark, dir), Testdata.cleanMatrix(spark, dir)))
  }

  test("Engine B plan stays fully codegen'd") {
    assertAllSubtreesCompile("engineB",
      graft.engines.AgeTaxCode.run(
        Testdata.cleanMatrix(spark, dir), Testdata.cleanDemo(spark, dir)))
  }

  test("Engine C plan stays fully codegen'd") {
    assertAllSubtreesCompile("engineC",
      graft.engines.RothTaxable.run(
        Testdata.cleanMatrix(spark, dir), Testdata.cleanDemo(spark, dir),
        Testdata.cleanBasis(spark, dir)))
  }

  test("Engine D plan stays fully codegen'd") {
    assertAllSubtreesCompile("engineD",
      graft.engines.IraRollover.run(Testdata.cleanMatrix(spark, dir)))
  }

  // --- TDP family -------------------------------------------------------
  // Spark evaluates higher-order-function lambdas (transform/filter/
  // aggregate) INTERPRETED by design, so the TDP text/embedding pipelines
  // can't be 100% codegen — but every subtree Spark DOES hand to janino
  // must still compile and stay clear of the 64 KB method limit: these
  // queries stack the deepest projections in the repo (shingle pipelines,
  // 18-slot reason arrays' cousins, 64-dim dot-product folds), which is
  // exactly where a collapsed projection silently tips over the limit.

  private val tdpGuarded = Seq(
    "tdp_quality_score", "tdp_token_count", "tdp_fingerprint",
    "tdp_minhash_signatures", "tdp_simhash", "tdp_bigram_logprob",
    "tdp_ann_ivf", "tdp_repetition", "tdp_pii_scan", "tdp_chunk_dedup",
    "tdp_lang_id", "tdp_lsh_cosine_buckets",
    "tdp_repeated_spans", "tdp_semdedup", "tdp_ann_sq8", "tdp_ann_pq",
    "tdp_ann_truncdim", "tdp_importance_resample", "tdp_seq_packing",
    "tdp_temperature_mix", "tdp_cluster_keep_best", "tdp_split_leakage",
    "tdp_doc_novelty", "tdp_vocab_topk", "tdp_source_pair_contamination",
    "tdp_budget_select", "tdp_cluster_balanced_sample", "tdp_gopher_filters",
    "tdp_length_outliers", "tdp_quality_dup_profile", "tdp_heldout_perplexity",
    "tdp_bloom_dedup", "tdp_ann_ivfpq", "tdp_heavy_hitters",
    "tdp_substring_dedup", "tdp_topk_sketch", "tdp_quantile_sketch",
    "tdp_ann_filtered", "tdp_join_size_est", "tdp_topk_per_group",
    "tdp_weighted_sample", "tdp_silhouette", "tdp_hard_negatives",
    "tdp_skew_profile", "tdp_shuffle_quality", "tdp_scd2_history",
    "tdp_tokenizer_fertility", "tdp_image_phash", "tdp_embedding_drift",
    "tdp_length_batching", "tdp_benford", "tdp_ann_ranking_metrics",
    "tdp_label_noise", "tdp_l_diversity", "tdp_audio_fingerprint",
    "tdp_incremental_neardup", "tdp_freshness_decay", "q34_star_join",
    "tdp_grouped_quantiles", "tdp_dataset_card", "tdp_text_normalize",
    "tdp_context_windows", "tdp_schema_drift", "tdp_lm_rollout",
    "tdp_triangle_count", "tdp_pareto_frontier", "tdp_winnow_fingerprint",
    "tdp_span_corruption", "tdp_pii_redact", "tdp_leakage_safe_split",
    "tdp_rank_fusion", "tdp_dedup_apply", "tdp_feature_hashing",
    "tdp_bm25", "tdp_classifier_calibration", "q39_lateral_topk",
    "q40_unpivot", "q41_null_semantics", "tdp_greedy_segment")
  // tdp_quality_classifier and tdp_shard_ablation are deliberately
  // absent: their RETURNED frames are literal trajectories (the gradient
  // passes run as separate jobs during construction, the BPE-loop
  // shape), so they have no codegen subtree of their own to compile.
  // q38_recursive_spine is absent because pre-execution recursive plans
  // carry no codegen subtrees (UnionLoop inserts stages at runtime).

  for (name <- tdpGuarded)
    test(s"TDP $name: every codegen subtree compiles under the 64 KB limit") {
      assertAllSubtreesCompile(name,
        graft.queries.Registry.queries(name)(spark, dir))
    }
}
