package graft.cleaning

import java.time.LocalDate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BooleanType

import graft.core.{Config, Normalizers => N, Validators => V}

/** Matrix disbursement cleaner — the Spark translation of
  * `/root/reference/src/cleaning/clean_matrix.py:240-462`.
  * Lazy `DataFrame => DataFrame`: rename -> project -> blocklist filters ->
  * field normalization -> date filter -> validation flags -> null-key drop ->
  * ingest-order dedup.
  */
object CleanMatrix {

  /** Blocklists; reference src/cleaning/clean_matrix.py:222-234. */
  val IgnoredMatrixAccounts: Set[String] = Set("07B00442", "07I00442", "07M00442")
  val IgnoredTxnMethods: Set[String] =
    Set("account transfer", "suspense transfer", "ach distribution reject", "check stop")

  def apply(
      rawDf: DataFrame,
      dropRowsMissingKeys: Boolean = true,
      dateFilter: Config.DateFilterConfig = Config.DateFilterConfig(),
      today: LocalDate = LocalDate.now(),
      warnCounts: Boolean = false): DataFrame = {
    import Cleaning._

    var df = withIngestId(rawDf)
    df = renameColumns(df, Config.MatrixColumnMap)
    df = keepColumns(df, Config.MatrixCoreColumns)
    val cols = df.columns.toSet

    // P3 — blocklist filters. pandas astype(str) maps NaN -> "nan" (not in
    // either blocklist), so null accounts/methods are KEPT — hence the
    // coalesce(false) here.
    if (cols("matrix_account"))
      df = df.filter(!coalesce(
        col("matrix_account").cast("string").isin(IgnoredMatrixAccounts.toSeq: _*),
        lit(false)))
    if (cols("txn_method"))
      df = df.filter(!coalesce(
        lower(trim(col("txn_method").cast("string"))).isin(IgnoredTxnMethods.toSeq: _*),
        lit(false)))

    df = withColumnIfPresent(df, "plan_id", N.normalizePlanId)
    df = withColumnIfPresent(df, "ssn", N.normalizeSsn)
    if (cols("ssn"))
      warnIf(df, col("ssn").isNull || length(col("ssn")) =!= 9,
        n => s"Matrix SSN normalization produced $n invalid values.", warnCounts)

    if (cols("txn_date")) {
      df = df.withColumn("txn_date", N.toDate(col("txn_date")))
      df = V.applyDateFilter(df, "txn_date", dateFilter)
    }

    // gross_amt feeds the null-key drop and the dedup key, so its
    // normalization must stay ahead of both.
    df = withColumnIfPresent(df, "gross_amt", N.toNumeric)

    // Heavy row-local tail: field normalizations and validation flags
    // that feed NEITHER the null-key drop NOR the dedup keys
    // (MatrixMatchKeys = plan_id/ssn/gross_amt/txn_date, all normalized
    // above). Row-local transforms commute with row filtering, so with
    // warnings off (the library/bench path) the tail runs AFTER the
    // dedup window's exchange — on the hash-partitioned survivors in
    // parallel, instead of serially inside the single-split scan task
    // (r14 optimization; guide §2.4 "establish the partitioning once,
    // then do the work after it"). The CLI path (warnCounts = true)
    // keeps the reference's exact order so the V7 QA counters observe
    // the same pre-dedup frames the reference warns on.
    def heavyTail(d0: DataFrame): DataFrame = {
      var d = d0
      d = withColumnIfPresent(d, "fed_taxable_amt", N.toNumeric)
      d = withColumnIfPresent(d, "roth_initial_contribution_year", N.toInt64)
      d = withColumnIfPresent(d, "state", N.normalizeState)
      for (c <- Seq("tax_code_1", "tax_code_2")) {
        d = withColumnIfPresent(d, c, N.normalizeTaxCode)
        if (cols(c))
          warnIf(d, col(c).isNotNull && length(col(c)) > 2,
            n => s"Matrix tax code normalization produced $n values longer than 2 characters.",
            warnCounts)
      }
      d = withColumnIfPresent(d, "transaction_id", N.normalizeTransactionId)
      for (c <- Seq("txn_method", "tax_form", "federal_taxing_method", "dist_type",
          "participant_name"))
        d = withColumnIfPresent(d, c, N.normalizeText(_))

      // Validation flags (reference :403-440); absent inputs -> null boolean.
      val nullFlag = lit(null).cast(BooleanType)
      val ssnValid = if (cols("ssn")) V.validateSsn(col("ssn")) else nullFlag
      val amountValid =
        if (cols("gross_amt") && cols("fed_taxable_amt"))
          V.validateAmounts(col("gross_amt"), Some(col("fed_taxable_amt")))
        else nullFlag
      val dateValid =
        if (cols("txn_date")) V.validateDates(col("txn_date"), today = today) else nullFlag
      val codeValid =
        if (cols("tax_code_1")) V.validate1099rCode(col("tax_code_1")) else nullFlag
      val crossIssues =
        if (cols("gross_amt") && cols("fed_taxable_amt") && cols("tax_code_1"))
          Some(V.crossValidate(col("gross_amt"), col("fed_taxable_amt"), col("tax_code_1")))
        else None

      d.withColumn("ssn_valid", ssnValid)
        .withColumn("amount_valid", amountValid)
        .withColumn("date_valid", dateValid)
        .withColumn("code_1099r_valid", codeValid)
        .withColumn("validation_issues",
          V.buildValidationIssues(col("ssn_valid"), col("amount_valid"),
            col("date_valid"), col("code_1099r_valid"), crossIssues))
    }

    def dropAndDedup(d0: DataFrame): DataFrame = {
      var d = d0
      val matchKeys = Config.MatrixMatchKeys.filter(d.columns.contains)
      if (dropRowsMissingKeys && matchKeys.nonEmpty) d = dropNullKeys(d, matchKeys)
      if (matchKeys.nonEmpty) d = dedupKeepFirst(d, matchKeys, col(IngestIdCol))
      d
    }

    if (warnCounts) dropAndDedup(heavyTail(df))
    else heavyTail(dropAndDedup(df))
  }
}
