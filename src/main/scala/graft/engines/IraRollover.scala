package graft.engines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.core.{Config, Normalizers => N}
import graft.core.Validators

/** Engine D — IRA-rollover tax-form audit: single-table filter + classify.
  *
  * Spark translation of
  * `/root/reference/src/engines/ira_rollover_analysis.py:54-143`.
  */
object IraRollover {

  val RequiredColumns: Seq[String] = Seq(
    "plan_id", "txn_method", "federal_taxing_method", "tax_form",
    "transaction_id", "txn_date", "ssn", "matrix_account")

  def run(
      matrixDf: DataFrame,
      cfg: Config.IraRolloverConfig = Config.IraRollover,
      dateFilter: Config.DateFilterConfig = Config.DateFilterConfig()): DataFrame = {
    val status = Config.MatchStatus

    val missing = RequiredColumns.filterNot(matrixDf.columns.contains)
    require(missing.isEmpty, s"Missing required columns: ${missing.mkString(", ")}")
    require(
      matrixDf.columns.contains("participant_name") || matrixDf.columns.contains("full_name"),
      "Expected participant_name or full_name column for correction outputs.")

    var df = Validators.applyDateFilter(matrixDf, "txn_date", dateFilter)

    // P8 — IRA plans with check-distribution method, then rollover codes
    // (reference :81-93); both filters push toward the scan.
    df = df.filter(
      N.isIraPlan(col("plan_id"), cfg) &&
        coalesce(N.normalizeSpaceLower(col("txn_method")) === "check distribution", lit(false)))
    val code1 = coalesce(N.normalizeTaxCode(col("tax_code_1")), lit(""))
    val code2 = coalesce(N.normalizeTaxCode(col("tax_code_2")), lit(""))
    df = df.filter(code1.isin("G", "H") || code2.isin("G", "H"))

    // C8 — classification (reference :95-141).
    val ftm = N.normalizeCompactUpper(col("federal_taxing_method"))
    val taxForm = N.normalizeCompactUpper(col("tax_form"))
    val missingFtm = ftm.isNull || ftm === ""
    val missingTaxForm = taxForm.isNull || taxForm === ""
    val ftmRollover = coalesce(ftm === "ROLLOVER", lit(false))
    val ftmNonRollover = !missingFtm && !ftmRollover
    val taxFormNoTax = coalesce(taxForm === "NOTAX", lit(false))
    val taxForm1099r = coalesce(taxForm === "1099R", lit(false))
    val taxFormUnknown = !missingTaxForm && !taxFormNoTax && !taxForm1099r

    val maskNoAction = ftmRollover && taxFormNoTax
    val maskCorrection = ftmRollover && taxForm1099r

    // Review reasons in reference append order, joined with "; ". Built
    // FLAT — concat_ws skips null entries, so one when() per token gives
    // the same string as the appended-array fold without nesting four
    // array expressions inside each other (the nested form blew the
    // generated projection past what janino could compile, knocking the
    // whole cache-fill stage out of whole-stage codegen). Tokens are
    // distinct constants, so the fold's seen-before dedup is vacuous.
    val reasonTokens = Seq(
      missingFtm -> "missing_federal_taxing_method",
      missingTaxForm -> "missing_tax_form",
      ftmNonRollover -> "federal_taxing_method_not_rollover",
      taxFormUnknown -> "unrecognized_tax_form")
    val reasonsJoined =
      nullif(concat_ws("; ", reasonTokens.map { case (m, tok) =>
        when(m, tok).otherwise(lit(null).cast(StringType))
      }: _*), lit(""))

    df.withColumn("match_status",
        when(maskNoAction, status.NoAction)
          .when(maskCorrection, status.NeedsCorrection)
          .otherwise(status.NeedsReview))
      .withColumn("action",
        when(maskCorrection, "UPDATE_1099")
          .when(!maskNoAction, "INVESTIGATE"))
      .withColumn("suggested_tax_code_1",
        when(maskCorrection, "0"))
      .withColumn("suggested_tax_code_2", lit(null).cast(StringType))
      .withColumn("new_tax_code", when(maskCorrection, "0"))
      .withColumn("correction_reason",
        when(maskCorrection, "ira_rollover_tax_form_1099r_expected_no_tax")
          .when(maskNoAction, lit(null).cast(StringType))
          .otherwise(reasonsJoined))
  }
}
