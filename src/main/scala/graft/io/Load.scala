package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import graft.core.Config

/** Schema'd source readers (SURVEY §2.1 S1–S5) — the Spark translation of
  * `/root/reference/src/core/load_data.py:119-306`. The reference reads
  * Excel exports; this build has no Excel datasource jar, so sources are
  * CSV (with explicit schemas — never inferred) or parquet with identical
  * columns. Required raw headers are validated up front (S5,
  * load_data.py:92-115).
  */
object Load {

  /** Raw Relius export schema (headers per Config.ReliusColumnMap). */
  val ReliusRawSchema: StructType = StructType(Seq(
    StructField("PLANID_1", StringType),
    StructField("SSNUM_1", StringType),
    StructField("FIRSTNAM", StringType),
    StructField("LASTNAM", StringType),
    StructField("STATEADDR", StringType),
    StructField("GROSSDISTRAMT", DoubleType),
    StructField("EXPORTEDDATE", DateType),
    StructField("TAXYR", LongType),
    StructField("DISTR1CD", StringType),
    StructField("DISTRNAM", StringType)))

  val MatrixRawSchema: StructType = StructType(
    Config.MatrixColumnMap.map { case (raw, canonical) =>
      val t = canonical match {
        case "gross_amt" | "fed_taxable_amt" | "roth_initial_contribution_year" =>
          DoubleType
        case "txn_date" => DateType
        case _ => StringType
      }
      StructField(raw, t)
    })

  val ReliusDemoRawSchema: StructType = StructType(Seq(
    StructField("PLANID", StringType),
    StructField("SSNUM", StringType),
    StructField("FIRSTNAM", StringType),
    StructField("LASTNAM", StringType),
    StructField("BIRTHDATE", DateType),
    StructField("TERM_DATE", DateType)))

  val RothBasisRawSchema: StructType = StructType(Seq(
    StructField("PLANID", StringType),
    StructField("SSNUM", StringType),
    StructField("FIRSTNAM", StringType),
    StructField("LASTNAM", StringType),
    StructField("FIRSTTAXYEARROTH", DoubleType),
    StructField("Total", DoubleType)))

  /** S5 — required-column validation; raises like the reference's
    * ValueError (load_data.py:92-115).
    */
  def validateColumns(df: DataFrame, required: Seq[String], label: String): DataFrame = {
    val missing = required.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"Missing expected columns in $label file: ${missing.mkString(", ")}")
    df
  }

  private def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    if (path.endsWith(".csv"))
      spark.read.option("header", "true").schema(schema).csv(path)
    else spark.read.parquet(path)

  /** S1 — Relius distributions. */
  def relius(spark: SparkSession, path: String): DataFrame =
    validateColumns(read(spark, path, ReliusRawSchema),
      Config.ReliusColumnMap.map(_._1), "Relius")

  /** S2 — Matrix disbursements. */
  def matrix(spark: SparkSession, path: String): DataFrame =
    validateColumns(read(spark, path, MatrixRawSchema),
      Config.MatrixColumnMap.map(_._1), "Matrix")

  /** S3 — Relius demographics (headers normalized strip+upper before
    * validation, load_data.py:216-261).
    */
  def reliusDemo(spark: SparkSession, path: String): DataFrame = {
    val raw = read(spark, path, ReliusDemoRawSchema)
    val normalized = raw.columns.foldLeft(raw) { (d, c) =>
      val n = c.trim.toUpperCase
      if (n != c && !c.startsWith("_")) d.withColumnRenamed(c, n) else d
    }
    validateColumns(normalized, Config.ReliusDemoColumnMap.map(_._1), "Relius demo")
  }

  /** S4 — Relius Roth basis. */
  def rothBasis(spark: SparkSession, path: String): DataFrame =
    validateColumns(read(spark, path, RothBasisRawSchema),
      Config.ReliusRothBasisColumnMap.map(_._1), "Roth basis")
}
