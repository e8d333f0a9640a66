package graft.cleaning

import java.time.LocalDate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BooleanType

import graft.core.{Config, Normalizers => N, Validators => V}

/** Relius demographics cleaner — the Spark translation of
  * `/root/reference/src/cleaning/clean_relius_demo.py:61-146`.
  * Headers are normalized (trim+upper) before mapping; required raw
  * columns must all be present.
  */
object CleanReliusDemo {

  def apply(
      rawDf: DataFrame,
      today: LocalDate = LocalDate.now(),
      warnCounts: Boolean = false): DataFrame = {
    import Cleaning._

    var df = withIngestId(rawDf)
    // Header normalize: strip().upper() on raw names (reference :81).
    df = df.columns.foldLeft(df) { (d, c) =>
      val norm = c.trim.toUpperCase
      // Internal bookkeeping columns (ingest id) are exempt from the
      // reference's raw-header normalization.
      if (norm != c && !c.startsWith("_")) d.withColumnRenamed(c, norm) else d
    }
    val required = Config.ReliusDemoColumnMap.map(_._1)
    val missing = required.filterNot(df.columns.contains)
    require(missing.isEmpty, s"Missing expected columns in Relius demo file: $missing")

    df = keepColumns(df, required)
    df = renameColumns(df, Config.ReliusDemoColumnMap)

    df = df.withColumn("ssn", N.normalizeSsn(col("ssn")))
    warnIf(df, col("ssn").isNull || length(col("ssn")) =!= 9,
      n => s"Relius demo SSN normalization produced $n invalid values.", warnCounts)

    df = df
      .withColumn("dob", N.toDate(col("dob")))
      .withColumn("term_date", N.toDate(col("term_date")))
      .withColumn("plan_id", N.normalizePlanId(col("plan_id")))
      .withColumn("first_name", N.normalizeText(col("first_name")))
      .withColumn("last_name", N.normalizeText(col("last_name")))

    // date_valid is masked to null where term_date is null (reference :122).
    val nullFlag = lit(null).cast(BooleanType)
    df = df
      .withColumn("ssn_valid", V.validateSsn(col("ssn")))
      .withColumn("amount_valid", nullFlag)
      .withColumn("date_valid",
        when(col("term_date").isNull, nullFlag)
          .otherwise(V.validateDates(col("term_date"), today = today)))
      .withColumn("code_1099r_valid", nullFlag)
      .withColumn("validation_issues",
        V.buildValidationIssues(col("ssn_valid"), col("amount_valid"),
          col("date_valid"), col("code_1099r_valid")))

    df = df.filter(col("ssn").isNotNull)
    // D2 — keep last-in-file per (plan_id, ssn) (reference :141-144).
    dedupKeepLast(df, Seq("plan_id", "ssn"), col(IngestIdCol))
  }
}
