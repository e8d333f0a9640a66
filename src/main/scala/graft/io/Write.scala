package graft.io

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.DataFrame

import graft.outputs.BuildCorrectionFile

/** Sinks (SURVEY §2.1 S6–S8) — the Spark translation of
  * `/root/reference/src/outputs/export_utils.py:43-107` and
  * `build_correction_file.py:309-361`. Excel workbooks become per-sheet
  * CSV directories; sheet-name truncation (31 chars) and duplicate
  * suffixing port as-is.
  */
object Write {

  val ValidEngines: Set[String] = Set("match_planid", "age_taxcode",
    "roth_taxable", "ira_rollover")

  /** Engine-routed output dir: reports/{samples|outputs}/<engine>
    * (reference build_correction_file.py:309-330).
    */
  def reportDir(baseDir: String, engine: String, sample: Boolean): String = {
    require(ValidEngines.contains(engine), s"Unknown engine: $engine")
    val bucket = if (sample) "samples" else "outputs"
    s"$baseDir/reports/$bucket/$engine"
  }

  /** Excel sheet-name constraint port: truncate to 31 chars and dedupe with
    * numeric suffixes (reference export_utils.py:43-61).
    */
  def sanitizeSheetNames(names: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.Map.empty[String, Int]
    names.map { n =>
      val base = n.take(31)
      seen.get(base) match {
        case None => seen(base) = 0; base
        case Some(i) =>
          val next = i + 1
          seen(base) = next
          val suffix = s"_$next"
          base.take(31 - suffix.length) + suffix
      }
    }
  }

  private val TsFormat = DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss")

  /** S6 — single-"sheet" write with timestamped name. */
  def writeDf(
      df: DataFrame,
      dir: String,
      stem: String,
      now: LocalDateTime = LocalDateTime.now()): String = {
    val path = s"$dir/${stem}_${now.format(TsFormat)}"
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
    path
  }

  /** S7 — multi-sheet workbook: one sub-path per sheet, names sanitized. */
  def writeMultiSheet(
      sheets: Seq[(String, DataFrame)],
      dir: String,
      stem: String,
      now: LocalDateTime = LocalDateTime.now()): Seq[String] = {
    val names = sanitizeSheetNames(sheets.map(_._1))
    names.zip(sheets.map(_._2)).map { case (sheet, df) =>
      val path = s"$dir/${stem}_${now.format(TsFormat)}/$sheet"
      df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
      path
    }
  }

  /** Scale-path sink: parquet partitioned by the given columns. At 100 TB
    * this is the layout that makes downstream scans cheap — a filter on a
    * partition column prunes whole directories at planning time
    * (PartitionFilters in the scan, asserted in IoSpec) instead of reading
    * and discarding rows. `maxRecordsPerFile` bounds file sizes so a
    * skewed partition cannot produce one giant file.
    */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      maxRecordsPerFile: Long = 5000000L): String = {
    df.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
    path
  }

  /** S8 — correction file: Correction/Investigate tab split, engine-routed
    * path (reference build_correction_file.py:309-361).
    */
  def writeCorrectionFile(
      corrections: DataFrame,
      baseDir: String,
      engine: String = "match_planid",
      sample: Boolean = false,
      now: LocalDateTime = LocalDateTime.now()): Seq[String] = {
    val dir = reportDir(baseDir, engine, sample)
    val tabs = BuildCorrectionFile.splitCorrectionsByAction(corrections)
    writeMultiSheet(
      Seq("Correction" -> tabs("Correction"), "Investigate" -> tabs("Investigate")),
      dir, "correction_file", now)
  }
}
