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

    df = withColumnIfPresent(df, "tax_year", N.toInt64)
    df = withColumnIfPresent(df, "gross_amt", N.toNumeric)
    df = withColumnIfPresent(df, "dist_code_1", N.normalizeText(_, strip = true, upper = true))
    if (cols("dist_code_1"))
      warnIf(df, col("dist_code_1").isNotNull && length(col("dist_code_1")) > 2,
        n => s"Relius dist_code_1 normalization produced $n values longer than 2 characters.",
        warnCounts)

    if (cols("dist_name"))
      df = df.withColumn("dist_category_relius", N.classifyReliusDistType(col("dist_name")))
    if (cols("first_name") && cols("last_name"))
      df = df.withColumn("full_name", N.fullName(col("first_name"), col("last_name")))

    val nullFlag = lit(null).cast(BooleanType)
    val ssnValid = if (cols("ssn")) V.validateSsn(col("ssn")) else nullFlag
    val amountValid =
      if (cols("gross_amt")) V.validateAmounts(col("gross_amt")) else nullFlag
    val dateValid =
      if (cols("exported_date")) V.validateDates(col("exported_date"), today = today)
      else nullFlag
    val codeValid =
      if (cols("dist_code_1")) V.validate1099rCode(col("dist_code_1")) else nullFlag

    df = df
      .withColumn("ssn_valid", ssnValid)
      .withColumn("amount_valid", amountValid)
      .withColumn("date_valid", dateValid)
      .withColumn("code_1099r_valid", codeValid)
      .withColumn("validation_issues",
        V.buildValidationIssues(col("ssn_valid"), col("amount_valid"),
          col("date_valid"), col("code_1099r_valid")))

    val matchKeys = Config.ReliusMatchKeys.filter(df.columns.contains)
    if (dropRowsMissingKeys && matchKeys.nonEmpty) df = dropNullKeys(df, matchKeys)
    if (matchKeys.nonEmpty) df = dedupKeepFirst(df, matchKeys, col(IngestIdCol))
    df
  }
}
