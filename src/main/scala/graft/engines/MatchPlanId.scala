package graft.engines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType}

import graft.core.{Config, Normalizers => N, Validators => V}

/** Engine A — inherited-plan reconciliation: full-outer equi-join of cleaned
  * Relius and Matrix on (plan_id, ssn, gross_amt) with pandas-style `_merge`
  * indicator, date-lag classification, and inherited-plan tax-code rules.
  *
  * Spark translation of `/root/reference/src/engines/match_planid.py:254-422`
  * (+ rules at :124-250). The plan-scope filter runs BEFORE the join on both
  * sides so Catalyst pushes it into the parquet scans. The full-outer join
  * itself cannot use a broadcast build side (Spark supports broadcasting
  * only inner/semi/one-sided-outer builds), so it is a sort-merge join on
  * (plan_id, ssn, gross_amt) — with the plan-scope filter applied first,
  * both shuffled sides are already minimal, and AQE handles residual skew.
  */
object MatchPlanId {

  /** Marker columns used to reproduce pandas' merge indicator. */
  private val InRelius = "_in_relius"
  private val InMatrix = "_in_matrix"

  def reconcile(
      reliusClean: DataFrame,
      matrixClean: DataFrame,
      planIds: Option[Set[String]] = Some(Config.DefaultReconciliationPlanIds),
      applyBusinessRules: Boolean = true,
      dateFilter: Config.DateFilterConfig = Config.DateFilterConfig(),
      broadcastRelius: Boolean = true): DataFrame = {

    val joinKeys = Config.MatchKeys // plan_id, ssn, gross_amt

    // Plan-scope filter (reference :309-314) — applied pre-join so it
    // reaches the scans of BOTH sides.
    def scope(df: DataFrame): DataFrame = planIds match {
      case Some(ids) => df.filter(col("plan_id").isin(ids.toSeq: _*))
      case None => df
    }
    var r = scope(reliusClean)
    var m = scope(matrixClean)

    // Guardrail date filters (reference :317-318).
    if (r.columns.contains("exported_date")) r = V.applyDateFilter(r, "exported_date", dateFilter)
    if (m.columns.contains("txn_date")) m = V.applyDateFilter(m, "txn_date", dateFilter)

    // Suffix colliding non-key columns like pandas' suffixes=("_relius","_matrix")
    // (reference :324-332).
    val collisions = (r.columns.toSet intersect m.columns.toSet) -- joinKeys
    r = collisions.foldLeft(r)((d, c) => d.withColumnRenamed(c, s"${c}_relius"))
    m = collisions.foldLeft(m)((d, c) => d.withColumnRenamed(c, s"${c}_matrix"))

    // Full outer join with pre-tagged side markers: after the join the
    // marker nullness identifies the source side (payload nulls would be
    // ambiguous — SURVEY §7.5.6). No broadcast hint: Spark rejects
    // broadcast builds for full-outer joins (HintErrorLogger warns and
    // falls back), so the hint would be a silent no-op.
    val rTagged = r.withColumn(InRelius, lit(true))
    val mTagged = m.withColumn(InMatrix, lit(true))
    var merged = rTagged.join(mTagged, joinKeys, "full_outer")
      .withColumn("_merge",
        when(col(InRelius).isNotNull && col(InMatrix).isNotNull, "both")
          .when(col(InRelius).isNotNull, "left_only")
          .otherwise("right_only"))
      .drop(InRelius, InMatrix)

    // Date lag + tolerance (reference :339-365).
    val hasDates = merged.columns.contains("exported_date") && merged.columns.contains("txn_date")
    merged =
      if (hasDates)
        merged
          .withColumn("date_lag_days",
            datediff(to_date(col("txn_date")), to_date(col("exported_date"))).cast(IntegerType))
          .withColumn("date_within_tolerance",
            coalesce(
              col("date_lag_days") >= 0 &&
                col("date_lag_days") <= Config.Matching.maxDateLagDays,
              lit(false)))
      else
        merged
          .withColumn("date_lag_days", lit(null).cast(IntegerType))
          .withColumn("date_within_tolerance", lit(false))

    val bothMask = col("_merge") === "both"

    // C1 — inherited-plan expectations (reference :124-250).
    merged =
      if (applyBusinessRules) {
        val isInherited = col("plan_id").isin(Config.InheritedPlanIds.toSeq: _*)
        val isRollover =
          if (merged.columns.contains("dist_category_relius"))
            coalesce(col("dist_category_relius").isin("rollover", "partial_rollover"), lit(false))
          else lit(false)
        val maskRollover = bothMask && isInherited && isRollover
        val maskCash = bothMask && isInherited && !isRollover

        val expected1 = when(maskRollover || maskCash, lit("4"))
        val expected2 = when(maskRollover, lit("G"))

        val code1 = coalesce(colOrNull(merged, "tax_code_1").cast(StringType), lit(""))
        val code2 = coalesce(colOrNull(merged, "tax_code_2").cast(StringType), lit(""))
        val codeMatches =
          (code1 === coalesce(expected1, lit(""))) && (code2 === coalesce(expected2, lit("")))
        val needsCorrection = bothMask && expected1.isNotNull && !codeMatches

        merged
          .withColumn("expected_tax_code_1", expected1)
          .withColumn("expected_tax_code_2", expected2)
          .withColumn("code_matches_expected", codeMatches)
          .withColumn("needs_correction", needsCorrection)
          .withColumn("suggested_tax_code_1", when(needsCorrection, expected1))
          .withColumn("suggested_tax_code_2", when(needsCorrection, expected2))
          .withColumn("correction_reason",
            when(needsCorrection && maskRollover, "inherited_rollover_expected_G_and_4")
              .when(needsCorrection && maskCash, "inherited_cash_expected_4"))
          .withColumn("action", when(needsCorrection, "UPDATE_1099"))
      } else {
        merged
          .withColumn("expected_tax_code_1", lit(null).cast(StringType))
          .withColumn("expected_tax_code_2", lit(null).cast(StringType))
          .withColumn("code_matches_expected", lit(null).cast("boolean"))
          .withColumn("needs_correction", lit(false))
          .withColumn("suggested_tax_code_1", lit(null).cast(StringType))
          .withColumn("suggested_tax_code_2", lit(null).cast(StringType))
          .withColumn("correction_reason", lit(null).cast(StringType))
          .withColumn("action", lit(null).cast(StringType))
      }

    // C2 — status ladder (reference :367-412); pandas last-write-wins
    // layering becomes a first-match-wins when-chain with inverted order.
    val withinRange = bothMask && col("date_within_tolerance")
    merged = merged.withColumn("match_status",
      when(col("_merge") === "left_only", Config.MatchStatus.UnmatchedRelius)
        .when(col("_merge") === "right_only", Config.MatchStatus.UnmatchedMatrix)
        .when(withinRange && col("needs_correction"), Config.MatchStatus.NeedsCorrection)
        .when(withinRange, Config.MatchStatus.NoAction)
        .when(bothMask, Config.MatchStatus.DateOutOfRange))

    // F18 — combined new tax code (reference :414-420).
    merged.withColumn("new_tax_code",
      N.combinedTaxCode(col("suggested_tax_code_1"), col("suggested_tax_code_2")))
  }

  private def colOrNull(df: DataFrame, name: String): Column =
    if (df.columns.contains(name)) col(name) else lit(null).cast(StringType)
}
