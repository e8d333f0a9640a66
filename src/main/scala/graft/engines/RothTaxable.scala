package graft.engines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

import graft.core.{Config, Normalizers => N}
import graft.core.Validators

/** Engine C — Roth taxable/basis/tax-code analysis.
  *
  * Spark translation of
  * `/root/reference/src/engines/roth_taxable_analysis.py:106-460`.
  * The per-participant 2025 gross total (reference :169-175, a groupby
  * mapped back onto rows) becomes a single window aggregate — no re-join.
  * Reason/action accumulation (reference's Python row loops) becomes
  * `when`/`array_append` folds that stay inside whole-stage codegen.
  */
object RothTaxable {

  def run(
      matrixDf: DataFrame,
      reliusDemoDf: DataFrame,
      reliusRothBasisDf: DataFrame,
      cfg: Config.RothTaxableConfig = Config.RothTaxable,
      dateFilter: Config.DateFilterConfig = Config.DateFilterConfig()): DataFrame = {
    val status = Config.MatchStatus
    val tc = Config.RothTaxCode
    val ageCfg = Config.AgeTaxCode

    var df = Validators.applyDateFilter(matrixDf, "txn_date", dateFilter)
    df = df.withColumn("plan_id", N.normalizePlanId(col("plan_id")))

    // Scope: Roth, non-inherited plans (reference :125-127) — pushed to the
    // scan before the joins.
    df = df.filter(
      N.isRothPlan(col("plan_id"), cfg) &&
        !col("plan_id").isin(Config.InheritedPlanIds.toSeq: _*))

    // J3/J4 — broadcast left joins with the two small dimensions.
    val demoCols = Seq("plan_id", "ssn", "dob", "term_date")
      .filter(reliusDemoDf.columns.contains)
    df = df.join(broadcast(reliusDemoDf.select(demoCols.map(col): _*)),
      Seq("plan_id", "ssn"), "left")
    val basisCols = Seq("plan_id", "ssn", "first_roth_tax_year", "roth_basis_amt")
    df = df.join(broadcast(reliusRothBasisDf.select(basisCols.map(col): _*)),
      Seq("plan_id", "ssn"), "left")

    if (!df.columns.contains("term_date"))
      df = df.withColumn("term_date", lit(null).cast("date"))
    if (!df.columns.contains("fed_taxable_amt"))
      df = df.withColumn("fed_taxable_amt", lit(null).cast(DoubleType))

    df = df
      .withColumn("txn_date", to_date(col("txn_date")))
      .withColumn("dob", to_date(col("dob")))
      .withColumn("term_date", to_date(col("term_date")))
      .withColumn("txn_year", year(col("txn_date")).cast(LongType))
      .withColumn("term_year", year(col("term_date")).cast(LongType))
      .withColumn("age_at_txn", N.computeAgeYears(col("dob"), col("txn_date")))
      .withColumn("age_at_termination", N.computeAgeYears(col("dob"), col("term_date")))
      .withColumn("gross_amt", N.toNumeric(col("gross_amt")))
      .withColumn("fed_taxable_amt", N.toNumeric(col("fed_taxable_amt")))
      .withColumn("roth_basis_amt", N.toNumeric(col("roth_basis_amt")))
      .withColumn("first_roth_tax_year", N.toNumeric(col("first_roth_tax_year")))
      .withColumn("roth_initial_contribution_year",
        N.toNumeric(col("roth_initial_contribution_year")))

    // ---- Staged mask materialization -------------------------------------
    // Every mask below is written to an intermediate column and downstream
    // logic references the COLUMN, not the expression. Inlining these
    // (round-1 style) nests the regexp/date arithmetic multiplicatively —
    // the 18 reason slots each embed the age masks, which embed the fix
    // masks, which embed the normalized codes — and the single collapsed
    // Project's generated `processNext()` exceeds janino's 64 KB method
    // limit: Spark burns ~40 s attempting the compile, then silently runs
    // the whole stage INTERPRETED (observed 49 s for the first Engine C
    // consumer at sf0.1). Materialized mask columns are non-cheap and
    // multiply-referenced, so CollapseProject keeps the projections
    // separate and each stays comfortably inside codegen. Same root cause
    // and cure as the round-1 Engine D reason-building fix.

    val firstYearValidExpr =
      col("first_roth_tax_year").isNotNull &&
        col("first_roth_tax_year") > 0 &&
        col("first_roth_tax_year").between(cfg.validYearMin, cfg.validYearMax)

    val startYear = N.computeStartYear(
      col("first_roth_tax_year"), col("roth_initial_contribution_year"))
    val startYearValid =
      startYear.isNotNull && startYear > 0 &&
        startYear.between(cfg.validYearMin, cfg.validYearMax)
    df = df.withColumn("start_roth_year", when(startYearValid, startYear))

    // A1 — per-participant basis-coverage-year gross total as a window
    // aggregate (sum ignores nulls and is null on empty, matching pandas
    // sum(min_count=1) + index.map semantics).
    val wParticipant = Window.partitionBy("plan_id", "ssn")
    df = df.withColumn("gross_2025_total",
      sum(when(col("txn_year") === cfg.basisCoverageYear, col("gross_amt")))
        .over(wParticipant))

    // Current codes, normalized + null->"" (reference :186-187), plus the
    // attained-age predicates — the most-reused (and regexp/date-heavy)
    // subexpressions, each materialized exactly once.
    df = df
      .withColumn("_cc1", coalesce(N.normalizeTaxCode(col("tax_code_1")), lit("")))
      .withColumn("_cc2", coalesce(N.normalizeTaxCode(col("tax_code_2")), lit("")))
      .withColumn("_att595",
        N.attainedAgeByYearEnd(col("dob"), col("txn_year"), 59, 6))
      .withColumn("_att_qualified",
        N.attainedAgeByYearEnd(col("dob"), col("txn_year"),
          cfg.qualifiedAgeYears.toInt,
          math.round((cfg.qualifiedAgeYears - cfg.qualifiedAgeYears.toInt) * 12).toInt))
      .withColumn("_att55_txn",
        N.attainedAgeByYearEnd(col("dob"), col("txn_year"),
          ageCfg.termRuleAgeYears.toInt))
      .withColumn("_att55_term",
        N.attainedAgeByYearEnd(col("dob"), col("term_year"),
          ageCfg.termRuleAgeYears.toInt))
      .withColumn("_first_year_valid", firstYearValidExpr)
    val currentCode1 = col("_cc1")
    val currentCode2 = col("_cc2")
    val attained595 = col("_att595")
    val attained55Txn = col("_att55_txn")
    val attained55Term = col("_att55_term")
    val firstYearValid = col("_first_year_valid")

    df = df.withColumn("_m_excluded",
      currentCode1.isin(tc.excludedCodesTaxcode: _*))
    val maskEngineExcluded = col("_m_excluded")
    val maskLocked = (currentCode1 === tc.rothRolloverCode) ||
      ((currentCode1 === tc.rothCode) && (currentCode2 === tc.deathCode))
    df = df.withColumn("tax_code_locked", maskLocked)

    // C4 — pre-taxable tax-code fix rules (reference :196-231); the six
    // masks are mutually exclusive (distinct (code1, code2) patterns).
    df = df
      .withColumn("_m_fix_bg", (currentCode1 === tc.rothCode) &&
        (currentCode2 === tc.rolloverCode) && !maskEngineExcluded)
      .withColumn("_m_fix_g4", (currentCode1 === tc.rolloverCode) &&
        (currentCode2 === tc.deathCode) && !maskEngineExcluded)
      .withColumn("_m_fix_4blank", (currentCode1 === tc.deathCode) &&
        (currentCode2 === "") && !maskEngineExcluded)
      .withColumn("_m_fix_blank4", (currentCode2 === tc.deathCode) &&
        (currentCode1 === "") && !maskEngineExcluded)
      .withColumn("_m_fix_gblank", (currentCode1 === tc.rolloverCode) &&
        (currentCode2 === "") && !maskEngineExcluded)
      .withColumn("_m_fix_blankg", (currentCode1 === "") &&
        (currentCode2 === tc.rolloverCode) && !maskEngineExcluded)
    val maskFixBG = col("_m_fix_bg")
    val maskFixG4 = col("_m_fix_g4")
    val maskFix4Blank = col("_m_fix_4blank")
    val maskFixBlank4 = col("_m_fix_blank4")
    val maskFixGBlank = col("_m_fix_gblank")
    val maskFixBlankG = col("_m_fix_blankg")
    df = df.withColumn("_m_override", maskFixBG || maskFixG4 || maskFix4Blank ||
      maskFixBlank4 || maskFixGBlank || maskFixBlankG)
    val maskOverride = col("_m_override")

    val suggested1FromFix =
      when(maskFixBG || maskFixG4 || maskFixGBlank || maskFixBlankG, tc.rothRolloverCode)
        .when(maskFix4Blank || maskFixBlank4, tc.rothCode)
    val suggested2FromFix =
      when(maskFixG4 || maskFix4Blank || maskFixBlank4, tc.deathCode)

    // Taxable / basis / year logic (reference :242-313).
    val activeMask = !maskEngineExcluded
    df = df
      .withColumn("_m_basis", activeMask &&
        col("roth_basis_amt").isNotNull && col("gross_2025_total").isNotNull &&
        col("roth_basis_amt") >= col("gross_2025_total"))
      .withColumn("_m_rawq", activeMask && col("_att_qualified") && startYearValid &&
        coalesce(col("txn_year") - startYear >= cfg.qualifiedYearsSinceFirst,
          lit(false)))
    val basisMask = col("_m_basis")
    val rawQualifiedMask = col("_m_rawq")
    // basis rule sets suggested_taxable first; qualified only fills gaps
    // (reference :279: qualified_mask = suggested.isna() & raw_qualified).
    df = df.withColumn("_sugg_taxable", when(basisMask || rawQualifiedMask, lit(0.0)))
    val suggestedTaxable = col("_sugg_taxable")

    val taxableSuggested = activeMask && suggestedTaxable.isNotNull
    df = df
      .withColumn("_m_tax_missing", taxableSuggested && col("fed_taxable_amt").isNull)
      .withColumn("_m_tax_change", taxableSuggested &&
        col("fed_taxable_amt").isNotNull &&
        abs(col("fed_taxable_amt") - suggestedTaxable) > 0.01)
      .withColumn("_m_year_change", activeMask && firstYearValid &&
        (col("roth_initial_contribution_year").isNull ||
          !(col("roth_initial_contribution_year") <=> col("first_roth_tax_year"))))
      .withColumn("_m_missing_first", activeMask && !firstYearValid)
      .withColumn("_m_proximity", activeMask &&
        coalesce(col("fed_taxable_amt") > 0, lit(false)) &&
        coalesce(col("gross_amt") <= col("fed_taxable_amt") * (1 + cfg.taxableProximityPct),
          lit(false)))
    val taxableMissingCurrent = col("_m_tax_missing")
    val taxableChangeRequired = col("_m_tax_change")
    val rothYearChangeRequired = col("_m_year_change")
    val missingFirstYearMask = col("_m_missing_first")
    val rawProximityMask = col("_m_proximity")

    df = df.withColumn("suggested_first_roth_tax_year",
      when(rothYearChangeRequired, col("first_roth_tax_year")))

    // Roth age-based expectations (reference :315-344).
    val hasDob = col("dob").isNotNull
    val hasTxnYear = col("txn_year").isNotNull
    val hasTermYear = col("term_year").isNotNull
    df = df.withColumn("_m_age_app", activeMask && !maskOverride &&
      !col("tax_code_locked") && hasDob && hasTxnYear)
    val maskAgeApplicable = col("_m_age_app")
    df = df
      .withColumn("_m_age_normal", maskAgeApplicable && attained595)
      .withColumn("_m_under_normal", maskAgeApplicable && !col("_m_age_normal"))
    val maskAgeNormal = col("_m_age_normal")
    val maskUnderNormal = col("_m_under_normal")
    df = df
      .withColumn("_m_term55p", maskUnderNormal && hasTermYear && attained55Term)
      .withColumn("_m_term_u55", maskUnderNormal && hasTermYear && !attained55Term)
      .withColumn("_m_dist_u55", maskUnderNormal && !hasTermYear && !attained55Txn)
      .withColumn("_m_dist55p", maskUnderNormal && !hasTermYear && attained55Txn)
    val maskTerm55Plus = col("_m_term55p")
    val maskTermUnder55 = col("_m_term_u55")
    val maskDistUnder55 = col("_m_dist_u55")
    val maskDist55Plus = col("_m_dist55p")

    df = df
      .withColumn("expected_tax_code_1", lit(tc.rothCode))
      .withColumn("expected_tax_code_2",
        when(maskAgeNormal, "7")
          .when(maskTerm55Plus, "2")
          .when(maskTermUnder55, "1")
          .when(maskDistUnder55, "1")
          .when(maskDist55Plus, "2"))
    val expectedCode2 = col("expected_tax_code_2")

    df = df.withColumn("_m_age_mismatch", maskAgeApplicable && (
      (currentCode1 =!= tc.rothCode) ||
        (expectedCode2.isNotNull && (currentCode2 =!= coalesce(expectedCode2, lit(""))))))
    val ageCodeMismatch = col("_m_age_mismatch")

    // Suggested codes: fixes win; age rule fills only unset slots
    // (reference :353-357).
    df = df
      .withColumn("suggested_tax_code_1",
        coalesce(suggested1FromFix, when(ageCodeMismatch, tc.rothCode)))
      .withColumn("suggested_tax_code_2",
        coalesce(suggested2FromFix,
          when(ageCodeMismatch && expectedCode2.isNotNull, expectedCode2)))
      .withColumn("suggested_taxable_amt", suggestedTaxable)

    // Action accumulation in reference append order (:205-231 fixes, then
    // :301-313 taxable/year, then :358 age). Only two distinct tokens exist,
    // so instead of an append-with-dedup fold (whose naive expression
    // nesting is exponential) we compute which token fires FIRST and emit
    // the deduped array directly. Append order: override(U), rothYear(U),
    // taxMissing(I), missingFirst(I), taxChange(U), proximity(I), age(U).
    val hasUpdateMask = maskOverride || rothYearChangeRequired ||
      taxableChangeRequired || ageCodeMismatch
    val hasInvestigateMask = taxableMissingCurrent || missingFirstYearMask ||
      rawProximityMask
    val updateFirst = maskOverride || rothYearChangeRequired ||
      (!(taxableMissingCurrent || missingFirstYearMask) && taxableChangeRequired) ||
      (!(taxableMissingCurrent || missingFirstYearMask || rawProximityMask) && ageCodeMismatch)
    df = df.withColumn("actions",
      when(hasUpdateMask && hasInvestigateMask,
        when(updateFirst, array(lit(tc.actionUpdate), lit(tc.actionInvestigate)))
          .otherwise(array(lit(tc.actionInvestigate), lit(tc.actionUpdate))))
        .when(hasUpdateMask, array(lit(tc.actionUpdate)))
        .when(hasInvestigateMask, array(lit(tc.actionInvestigate)))
        .otherwise(array().cast("array<string>")))

    // Reason accumulation in reference append order (:205-231, :361-393).
    // Every token is distinct, so dedup never fires and the append order is
    // just the static slot order: a conditional-token array + null filter.
    // Slot predicates reference ONLY materialized mask columns (see the
    // staging note above) so this projection's generated code is linear in
    // the slot count, not multiplicative in the mask depth.
    val ageUpdateMask = ageCodeMismatch && expectedCode2.isNotNull
    val reasonSlots: Seq[(Column, String)] = Seq(
      maskFixBG -> "roth_rollover_code_fix_B_G_to_H",
      maskFixG4 -> "roth_rollover_code_fix_G_4_to_H_4",
      maskFix4Blank -> "roth_death_code_fix_4_to_B_4",
      maskFixBlank4 -> "roth_death_code_fix_blank_4_to_B_4",
      maskFixGBlank -> "roth_rollover_code_fix_G_blank_to_H",
      maskFixBlankG -> "roth_rollover_code_fix_blank_G_to_H",
      rothYearChangeRequired -> "roth_initial_year_mismatch",
      missingFirstYearMask -> "missing_first_roth_tax_year",
      basisMask -> "roth_basis_covers_2025_total",
      rawQualifiedMask -> "qualified_roth_distribution",
      taxableMissingCurrent -> "missing_fed_taxable_amt",
      rawProximityMask -> "taxable_within_15pct_of_gross",
      ageCodeMismatch -> "roth_age_tax_code_mismatch",
      (ageUpdateMask && attained595) ->
        "roth_age_rule_attained_59_5_in_txn_year_expect_B7",
      (ageUpdateMask && !attained595 && hasTermYear && attained55Term) ->
        "roth_age_rule_attained_55_in_term_year_expect_B2",
      (ageUpdateMask && !attained595 && hasTermYear && !attained55Term) ->
        "roth_age_rule_under_55_in_term_year_expect_B1",
      (ageUpdateMask && !attained595 && !hasTermYear && attained55Txn) ->
        "roth_age_rule_attained_55_in_txn_year_no_term_expect_B2",
      (ageUpdateMask && !attained595 && !hasTermYear && !attained55Txn) ->
        "roth_age_rule_under_55_in_txn_year_no_term_expect_B1")
    df = df.withColumn("correction_reasons",
      filter(array(reasonSlots.map { case (m, tok) => when(m, lit(tok)) }: _*),
        x => x.isNotNull))

    // C7 — status/action finalize (reference :396-424).
    val hasUpdate = array_contains(col("actions"), tc.actionUpdate)
    val hasInvestigate = array_contains(col("actions"), tc.actionInvestigate)
    df = df
      .withColumn("match_status",
        when(maskEngineExcluded, tc.statusExcluded)
          .when(hasUpdate, status.NeedsCorrection)
          .when(hasInvestigate, status.NeedsReview)
          .otherwise(status.NoAction))
      .withColumn("action", N.joinActions(col("actions"), tc.actionJoiner))
      .withColumn("correction_reason",
        when(col("match_status") === status.NoAction, lit(null).cast(StringType))
          .otherwise(N.joinReasons(col("correction_reasons"), tc.reasonBullet, tc.reasonJoiner)))

    val noAction = col("match_status") === status.NoAction
    df = df
      .withColumn("suggested_tax_code_1", when(!noAction, col("suggested_tax_code_1")))
      .withColumn("suggested_tax_code_2", when(!noAction, col("suggested_tax_code_2")))
      .withColumn("suggested_taxable_amt",
        when(noAction && col("fed_taxable_amt") === 0, lit(null).cast(DoubleType))
          .otherwise(col("suggested_taxable_amt")))
      .withColumn("new_tax_code",
        N.combinedTaxCode(col("suggested_tax_code_1"), col("suggested_tax_code_2")))

    df.select(
      "transaction_id", "txn_date", "ssn", "participant_name", "matrix_account",
      "plan_id", "tax_code_1", "tax_code_2", "suggested_tax_code_1",
      "suggested_tax_code_2", "new_tax_code", "fed_taxable_amt", "gross_amt",
      "roth_initial_contribution_year", "first_roth_tax_year", "start_roth_year",
      "roth_basis_amt", "age_at_txn", "suggested_taxable_amt",
      "suggested_first_roth_tax_year", "correction_reason", "action", "match_status")
  }
}
