package graft.outputs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

import graft.core.{Normalizers => N}

/** O1/O2 — correction-file shaping: filter actionable rows, project to the
  * Matrix correction-template headers, and split the result into
  * Correction/Investigate tabs.
  *
  * Spark translation of
  * `/root/reference/src/outputs/build_correction_file.py:125-305` and
  * `/root/reference/src/core/normalizers.py:286-316`.
  */
object BuildCorrectionFile {

  val OutCols: Seq[String] = Seq(
    "Transaction Id", "Transaction Date", "Participant SSN", "Participant Name",
    "Matrix Account", "Current Tax Code 1", "Current Tax Code 2", "New Tax Code",
    "New Taxable Amount", "New First Year contrib", "Reason", "Action")

  private val renameMap: Seq[(String, String)] = Seq(
    "transaction_id" -> "Transaction Id",
    "txn_date" -> "Transaction Date",
    "ssn" -> "Participant SSN",
    "participant_name_final" -> "Participant Name",
    "matrix_account" -> "Matrix Account",
    "tax_code_1" -> "Current Tax Code 1",
    "tax_code_2" -> "Current Tax Code 2",
    "new_tax_code" -> "New Tax Code",
    "suggested_taxable_amt" -> "New Taxable Amount",
    "suggested_first_roth_tax_year" -> "New First Year contrib",
    "correction_reason" -> "Reason",
    "action" -> "Action")

  /** P12 + O1 — select correction rows and shape to template headers. */
  def buildCorrectionDataFrame(
      matches: DataFrame,
      allowedActions: Option[Seq[String]] = Some(Seq("UPDATE_1099", "INVESTIGATE"))): DataFrame = {
    val cols = matches.columns.toSet
    def colOr(name: String, default: Column): Column =
      if (cols(name)) col(name) else default

    val maskNeedsCorr = col("match_status")
      .isin("match_needs_correction", "match_needs_review")

    val suggestionCols = Seq(
      "suggested_tax_code_1", "suggested_tax_code_2",
      "suggested_taxable_amt", "suggested_first_roth_tax_year").filter(cols)
    val baseSuggestion = suggestionCols
      .map(c => col(c).isNotNull)
      .reduceOption(_ || _)
      .getOrElse(lit(false))

    val maskInRange = {
      val mergeMask =
        if (cols("_merge")) col("_merge") === "both" else lit(true)
      val dateMask =
        if (cols("date_within_tolerance")) coalesce(col("date_within_tolerance"), lit(false))
        else lit(true)
      mergeMask && dateMask
    }

    val actionTokens = if (cols("action")) Some(N.actionTokens(col("action"))) else None
    val maskHasInvestigate = actionTokens
      .map(t => array_contains(t, "INVESTIGATE"))
      .getOrElse(lit(false))
    val maskHasSuggestion = baseSuggestion || maskHasInvestigate

    val maskAction = (actionTokens, allowedActions) match {
      case (Some(tokens), Some(allowed)) =>
        val allowedNorm = allowed.map(_.trim.toUpperCase)
        coalesce(exists(tokens, t => t.isin(allowedNorm: _*)), lit(false))
      case _ => lit(true)
    }

    val filtered = matches
      .filter(maskNeedsCorr && maskHasSuggestion && maskInRange && maskAction)

    val participantFinal =
      if (cols("participant_name")) col("participant_name")
      else if (cols("full_name")) col("full_name")
      else lit(null).cast(StringType)

    val withDerived = filtered
      .withColumn("participant_name_final", participantFinal)
      .withColumn("suggested_taxable_amt",
        colOr("suggested_taxable_amt", lit(null).cast(DoubleType)))
      .withColumn("suggested_first_roth_tax_year",
        colOr("suggested_first_roth_tax_year", lit(null).cast(LongType)))
      .withColumn("new_tax_code",
        if (cols("new_tax_code")) col("new_tax_code")
        else N.combinedTaxCode(
          colOr("suggested_tax_code_1", lit(null).cast(StringType)),
          colOr("suggested_tax_code_2", lit(null).cast(StringType))))
      .withColumn("transaction_id", colOr("transaction_id", lit(null).cast(StringType)))
      .withColumn("txn_date", colOr("txn_date", lit(null).cast("date")))
      .withColumn("ssn", colOr("ssn", lit(null).cast(StringType)))
      .withColumn("matrix_account", colOr("matrix_account", lit(null).cast(StringType)))
      .withColumn("tax_code_1", colOr("tax_code_1", lit(null).cast(StringType)))
      .withColumn("tax_code_2", colOr("tax_code_2", lit(null).cast(StringType)))
      .withColumn("correction_reason", colOr("correction_reason", lit(null).cast(StringType)))
      .withColumn("action", colOr("action", lit(null).cast(StringType)))

    val projected = renameMap.foldLeft(withDerived) { case (d, (from, to)) =>
      d.withColumnRenamed(from, to)
    }.select(OutCols.map(col): _*)

    // D4 — output sort (reference :296-302).
    projected.orderBy("Matrix Account", "Participant SSN", "Transaction Date")
  }

  /** O2 — split into Correction (UPDATE_1099) / Investigate tabs; rows
    * carrying both actions land in both outputs with the action literal
    * overwritten. reference src/core/normalizers.py:286-316.
    */
  def splitCorrectionsByAction(corrections: DataFrame): Map[String, DataFrame] = {
    val actionCol =
      if (corrections.columns.contains("Action")) "Action"
      else if (corrections.columns.contains("action")) "action"
      else return Map(
        "Correction" -> corrections.limit(0),
        "Investigate" -> corrections.limit(0))

    val tokens = N.actionTokens(col(actionCol))
    val correction = corrections
      .filter(array_contains(tokens, "UPDATE_1099"))
      .withColumn(actionCol, lit("UPDATE_1099"))
    val investigate = corrections
      .filter(array_contains(tokens, "INVESTIGATE"))
      .withColumn(actionCol, lit("INVESTIGATE"))
    Map("Correction" -> correction, "Investigate" -> investigate)
  }
}
