package graft.cleaning

import java.time.LocalDate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BooleanType

import graft.core.{Config, Normalizers => N, Validators => V}

/** Relius distribution cleaner — the Spark translation of
  * `/root/reference/src/cleaning/clean_relius.py:203-349`.
  */
object CleanRelius {

  def apply(
      rawDf: DataFrame,
      dropRowsMissingKeys: Boolean = true,
      dateFilter: Config.DateFilterConfig = Config.DateFilterConfig(),
      today: LocalDate = LocalDate.now(),
      warnCounts: Boolean = false): DataFrame = {
    import Cleaning._

    var df = withIngestId(rawDf)
    df = renameColumns(df, Config.ReliusColumnMap)
    df = keepColumns(df, Config.ReliusCoreColumns)
    val cols = df.columns.toSet

    df = withColumnIfPresent(df, "plan_id", N.normalizePlanId)
    df = withColumnIfPresent(df, "ssn", N.normalizeSsn)
    if (cols("ssn"))
      warnIf(df, col("ssn").isNull || length(col("ssn")) =!= 9,
        n => s"Relius SSN normalization produced $n invalid values.", warnCounts)

    if (cols("exported_date")) {
      df = df.withColumn("exported_date", N.toDate(col("exported_date")))
      df = V.applyDateFilter(df, "exported_date", dateFilter)
    }

    // tax_year and gross_amt feed the null-key drop and the dedup key
    // (ReliusMatchKeys = plan_id/ssn/gross_amt/exported_date/tax_year),
    // so their normalization must stay ahead of both.
    df = withColumnIfPresent(df, "tax_year", N.toInt64)
    df = withColumnIfPresent(df, "gross_amt", N.toNumeric)

    // Heavy row-local tail behind the dedup exchange when warnings are
    // off — see CleanMatrix for the full rationale (r14: parallelize the
    // single-split scan's serial normalizer chain on the dedup window's
    // hash partitioning; the CLI QA path keeps the reference order).
    def heavyTail(d0: DataFrame): DataFrame = {
      var d = d0
      d = withColumnIfPresent(d, "dist_code_1", N.normalizeText(_, strip = true, upper = true))
      if (cols("dist_code_1"))
        warnIf(d, col("dist_code_1").isNotNull && length(col("dist_code_1")) > 2,
          n => s"Relius dist_code_1 normalization produced $n values longer than 2 characters.",
          warnCounts)

      if (cols("dist_name"))
        d = d.withColumn("dist_category_relius", N.classifyReliusDistType(col("dist_name")))
      if (cols("first_name") && cols("last_name"))
        d = d.withColumn("full_name", N.fullName(col("first_name"), col("last_name")))

      val nullFlag = lit(null).cast(BooleanType)
      val ssnValid = if (cols("ssn")) V.validateSsn(col("ssn")) else nullFlag
      val amountValid =
        if (cols("gross_amt")) V.validateAmounts(col("gross_amt")) else nullFlag
      val dateValid =
        if (cols("exported_date")) V.validateDates(col("exported_date"), today = today)
        else nullFlag
      val codeValid =
        if (cols("dist_code_1")) V.validate1099rCode(col("dist_code_1")) else nullFlag

      d.withColumn("ssn_valid", ssnValid)
        .withColumn("amount_valid", amountValid)
        .withColumn("date_valid", dateValid)
        .withColumn("code_1099r_valid", codeValid)
        .withColumn("validation_issues",
          V.buildValidationIssues(col("ssn_valid"), col("amount_valid"),
            col("date_valid"), col("code_1099r_valid")))
    }

    def dropAndDedup(d0: DataFrame): DataFrame = {
      var d = d0
      val matchKeys = Config.ReliusMatchKeys.filter(d.columns.contains)
      if (dropRowsMissingKeys && matchKeys.nonEmpty) d = dropNullKeys(d, matchKeys)
      if (matchKeys.nonEmpty) d = dedupKeepFirst(d, matchKeys, col(IngestIdCol))
      d
    }

    if (warnCounts) dropAndDedup(heavyTail(df))
    else heavyTail(dropAndDedup(df))
  }
}
