package graft.engines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

import graft.core.{Config, Normalizers => N}
import graft.core.Validators

/** Engine B — age-based 1099-R tax-code audit over Matrix distributions
  * joined with Relius demographics.
  *
  * Spark translation of
  * `/root/reference/src/engines/age_taxcode_analysis.py:117-366`.
  * The demographics dimension is broadcast (small side of J2).
  */
object AgeTaxCode {

  /** J2 — left-join demographics onto Matrix rows; defensive date casts and
    * unified full_name (Matrix participant_name first, Relius names as
    * fallback). reference :117-160.
    */
  def attachDemoToMatrix(matrixDf: DataFrame, reliusDemoDf: DataFrame): DataFrame = {
    val keyCols = Seq("plan_id", "ssn")
    val demoCols = Seq("dob", "term_date", "first_name", "last_name")
    val demo = reliusDemoDf.select((keyCols ++ demoCols).map(col): _*)

    val merged = matrixDf.join(broadcast(demo), keyCols, "left")
      .withColumn("dob", to_date(col("dob")))
      .withColumn("term_date", to_date(col("term_date")))

    val participant =
      if (merged.columns.contains("participant_name")) col("participant_name")
      else lit(null).cast(StringType)
    merged.withColumn("full_name",
      coalesce(participant, N.fullName(col("first_name"), col("last_name"))))
  }

  def run(
      matrixDf: DataFrame,
      reliusDemoDf: DataFrame,
      dateFilter: Config.DateFilterConfig = Config.DateFilterConfig(),
      cfg: Config.AgeTaxCodeConfig = Config.AgeTaxCode): DataFrame = {
    val status = Config.MatchStatus

    val matrixFiltered = Validators.applyDateFilter(matrixDf, "txn_date", dateFilter)
    var df = attachDemoToMatrix(matrixFiltered, reliusDemoDf)

    // Defensive re-normalization of codes (reference :222-232).
    for (c <- Seq("tax_code_1", "tax_code_2"))
      if (df.columns.contains(c)) df = df.withColumn(c, N.normalizeTaxCode(col(c)))

    // Exclusion flags (reference :234-247). Roth rows are dropped entirely;
    // the rollover/inherited masks are row-wise, so computing them after the
    // filter matches the reference's pre-filter masks + index alignment.
    val isRoth = N.isRothPlan(col("plan_id"), Config.RothTaxable, caseInsensitive = true)
    df = df.filter(!isRoth)
    val maskRolloverCode =
      coalesce(col("tax_code_1").isin(cfg.excludedCodes: _*), lit(false))
    val maskInherited = col("plan_id").isin(Config.InheritedPlanIds.toSeq: _*)
    df = df.withColumn("age_engine_excluded", maskRolloverCode || maskInherited)

    // Year fields + attained-age flags (reference :249-269).
    val txnYear = year(to_date(col("txn_date")))
    val termYear = year(to_date(col("term_date")))
    val dobYear = year(to_date(col("dob")))
    df = df
      .withColumn("dob_year", dobYear.cast(LongType))
      .withColumn("txn_year", txnYear.cast(LongType))
      .withColumn("term_year", termYear.cast(LongType))
      .withColumn("age_at_distribution_year", (txnYear - dobYear).cast(DoubleType))
      .withColumn("age_at_termination_year", (termYear - dobYear).cast(DoubleType))
      .withColumn("attained_59_5_in_txn_year",
        N.attainedAgeByYearEnd(col("dob"), col("txn_year"), 59, 6))
      .withColumn("attained_55_in_txn_year",
        N.attainedAgeByYearEnd(col("dob"), col("txn_year"), 55))
      .withColumn("attained_55_in_term_year",
        N.attainedAgeByYearEnd(col("dob"), col("term_year"), 55))

    val attained595 = col("attained_59_5_in_txn_year")
    val attained55Term = col("attained_55_in_term_year")
    val attained55Txn = col("attained_55_in_txn_year")
    val hasDob = col("dob").isNotNull
    val hasTxnYear = col("txn_year").isNotNull
    val hasTermYear = col("term_year").isNotNull
    val eligible = !col("age_engine_excluded") && hasDob && hasTxnYear

    // C3 — rule ladder (reference :289-325). Branch masks are mutually
    // exclusive, so the when-chain is order-safe.
    val maskNormal = eligible && attained595
    val maskUnder = eligible && !maskNormal
    val maskTerm55Plus = maskUnder && hasTermYear && attained55Term
    val maskTermUnder55 = maskUnder && hasTermYear && !attained55Term
    val maskDistUnder55 = maskUnder && !hasTermYear && !attained55Txn
    val maskDist55Plus = maskUnder && !hasTermYear && attained55Txn

    val expected1 =
      when(maskNormal, cfg.normalDistCode)
        .when(maskTerm55Plus, cfg.age55PlusCode)
        .when(maskTermUnder55, cfg.under55Code)
        .when(maskDistUnder55, cfg.under55Code)
        .when(maskDist55Plus, cfg.age55PlusCode)
    val reasonLadder =
      when(maskNormal, "age_59_5_or_over_normal_distribution")
        .when(maskTerm55Plus, "terminated_at_or_after_55")
        .when(maskTermUnder55, "terminated_before_55")
        .when(maskDistUnder55, "no_term_date_under_55_in_txn_year")
        .when(maskDist55Plus, "no_term_date_55_plus_in_txn_year")

    df = df
      .withColumn("expected_tax_code_1", expected1)
      .withColumn("expected_tax_code_2", lit(null).cast(StringType))

    // Compare (reference :331-350): non-Roth compares tax_code_1 only.
    val code1 = coalesce(col("tax_code_1"), lit(""))
    val hasExpected = col("expected_tax_code_1").isNotNull
    val matches = hasExpected && (code1 === coalesce(col("expected_tax_code_1"), lit("")))
    val needCorr = hasExpected && !matches && !col("age_engine_excluded")

    df = df
      .withColumn("code_matches_expected", matches)
      .withColumn("match_status",
        when(matches, status.NoAction)
          .when(needCorr, status.NeedsCorrection)
          .when(col("age_engine_excluded"), status.ExcludedAgeEngine)
          .otherwise(status.InsufficientData))
      .withColumn("action", when(needCorr, "UPDATE_1099"))
      .withColumn("correction_reason", when(!matches, reasonLadder))

    // Suggestions cleared on no-action rows (reference :352-356).
    df = df
      .withColumn("suggested_tax_code_1",
        when(col("match_status") =!= status.NoAction, col("expected_tax_code_1")))
      .withColumn("suggested_tax_code_2",
        when(col("match_status") =!= status.NoAction, col("expected_tax_code_2")))

    df.withColumn("new_tax_code",
      N.combinedTaxCode(col("suggested_tax_code_1"), col("suggested_tax_code_2")))
  }
}
