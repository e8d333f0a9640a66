package graft.cleaning

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BooleanType

import graft.core.{Config, Normalizers => N, Validators => V}

/** Relius Roth-basis cleaner — the Spark translation of
  * `/root/reference/src/cleaning/clean_relius_roth_basis.py:92-175`.
  */
object CleanRothBasis {

  def apply(rawDf: DataFrame, warnCounts: Boolean = false): DataFrame = {
    import Cleaning._

    var df = withIngestId(rawDf)
    df = renameColumns(df, Config.ReliusRothBasisColumnMap)
    df = keepColumns(df, Config.ReliusRothBasisCoreColumns)
    val cols = df.columns.toSet

    df = withColumnIfPresent(df, "ssn", N.normalizeSsn)
    if (cols("ssn"))
      warnIf(df, col("ssn").isNull || length(col("ssn")) =!= 9,
        n => s"Roth basis SSN normalization produced $n invalid values.", warnCounts)
    df = withColumnIfPresent(df, "plan_id", N.normalizePlanId)
    for (c <- Seq("first_name", "last_name"))
      df = withColumnIfPresent(df, c, N.normalizeText(_))
    df = withColumnIfPresent(df, "first_roth_tax_year", N.toInt64)
    df = withColumnIfPresent(df, "roth_basis_amt", N.toNumeric)

    val nullFlag = lit(null).cast(BooleanType)
    val ssnValid = if (cols("ssn")) V.validateSsn(col("ssn")) else nullFlag
    val amountValid =
      if (cols("roth_basis_amt")) V.validateAmounts(col("roth_basis_amt")) else nullFlag

    df = df
      .withColumn("ssn_valid", ssnValid)
      .withColumn("amount_valid", amountValid)
      .withColumn("date_valid", nullFlag)
      .withColumn("code_1099r_valid", nullFlag)
      .withColumn("validation_issues",
        V.buildValidationIssues(col("ssn_valid"), col("amount_valid"),
          col("date_valid"), col("code_1099r_valid")))

    // D3 — keep the most complete row per (plan_id, ssn); first-in-file on
    // ties (reference :164-172).
    if (cols("plan_id") && cols("ssn"))
      dedupByCompleteness(df, Seq("plan_id", "ssn"),
        Seq("first_roth_tax_year", "roth_basis_amt"), col(IngestIdCol))
    else df
  }
}
