package graft.queries

import java.time.LocalDate

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.cleaning.{CleanMatrix, CleanRelius, CleanReliusDemo, CleanRothBasis}

/** Deterministic adapter from the driver's TPC-H-ish testdata onto the
  * reconciliation schema (SURVEY §1.2): derives raw Relius/Matrix/demo/basis
  * frames from `orders` with pure integer/string arithmetic so the DuckDB
  * oracle (OracleSql.scala) can derive bit-identical inputs.
  *
  * Every derivation here has a 1:1 SQL twin in [[OracleSql.Prelude]]; keep
  * the two in sync (the driver's correctness gate diffs them at sf0.01).
  */
object Testdata {

  /** Fixed "today" injected into cleaners for deterministic V3 date checks. */
  val Today: LocalDate = LocalDate.of(2026, 1, 1)

  private val k = col("k")
  private val c = col("c")
  private val g = col("g")

  /** Shared per-order derivations (twin: OracleSql.Prelude `base`). */
  def base(spark: SparkSession, dir: String): DataFrame = {
    val exported = date_add(to_date(lit("2024-06-01")), (col("k") % 400).cast(IntegerType))
    Registry.table(spark, dir, "orders")
      .select(
        col("o_orderkey").as("k"),
        col("o_custkey").as("c"),
        floor(col("o_totalprice")).cast(LongType).as("g"))
      .withColumn("exported_date", exported)
      .withColumn("txn_date", date_add(col("exported_date"), (col("k") % 15).cast(IntegerType)))
      .withColumn("plan_id",
        when(k % 10 === 0, "300004PLAT")
          .when(k % 10 === 1, "300004MBD")
          .when(k % 10 === 2, "300004MBDII")
          .when(k % 10 === 3, "300005A")
          .when(k % 10 === 4, "200777R")
          .when(k % 10 === 5, "300001IRA")
          .when(k % 10 === 6, "400200IRA")
          .when(k % 10 === 7, "200100")
          .when(k % 10 === 8, "200200")
          .otherwise("200300"))
      .withColumn("ssn_base",
        lpad((lit(100000000L) + (c * 37 + 11) % 800000000L).cast(StringType), 9, "0"))
      .withColumn("first_name", concat(lit("First"), (c % 50).cast(StringType)))
      .withColumn("last_name", concat(lit("Last"), (c % 50).cast(StringType)))
      .withColumn("state_raw",
        when(c % 5 === 0, "ca").when(c % 5 === 1, "NY").when(c % 5 === 2, " tx")
          .when(c % 5 === 3, "FL ").otherwise("wa"))
  }

  private def reliusCols(ssnCol: Column, lastNameCol: Column, ingest: Column): Seq[Column] = Seq(
    col("plan_id").as("PLANID_1"),
    ssnCol.as("SSNUM_1"),
    col("first_name").as("FIRSTNAM"),
    lastNameCol.as("LASTNAM"),
    col("state_raw").as("STATEADDR"),
    (g + when(k % 41 === 0, 1L).otherwise(0L)).cast(DoubleType).as("GROSSDISTRAMT"),
    col("exported_date").as("EXPORTEDDATE"),
    year(col("exported_date")).cast(LongType).as("TAXYR"),
    when(k % 8 === 0, "7").when(k % 8 === 1, "4").when(k % 8 === 2, "G")
      .when(k % 8 === 3, "1").when(k % 8 === 4, "2").when(k % 8 === 5, "B")
      .when(k % 8 === 6, " 7 ").otherwise("ZZ").as("DISTR1CD"),
    when(k % 7 === 0, "Rollover to IRA")
      .when(k % 7 === 1, "Partial Rollover")
      .when(k % 7 === 2, "RMD Distribution")
      .when(k % 7 === 3, "Partial Liquidation")
      .when(k % 7 === 4, "Full Liquidation - Final")
      .when(k % 7 === 5, "Recurring Payment")
      .otherwise("Death Benefit Payment").as("DISTRNAM"),
    ingest.as("_ingest_id"))

  /** Raw Relius export rows (twin: `relius_raw`). ~3% bad SSNs, ~2.5% gross
    * perturbed off the Matrix amount, ~5% duplicated under the match keys.
    */
  def reliusRaw(spark: SparkSession, dir: String): DataFrame = {
    val b = base(spark, dir).filter(k % 37 =!= 0)
    val main = b.select(reliusCols(
      when(k % 47 === 0, "BADSSN").otherwise(col("ssn_base")), col("last_name"), k): _*)
    val dups = b.filter(k % 19 === 0).select(reliusCols(
      col("ssn_base"), concat(lit("DupLast"), (c % 50).cast(StringType)),
      k + 100000000L): _*)
    main.unionAll(dups)
  }

  private def matrixCols(txnIdCol: Column, ingest: Column): Seq[Column] = Seq(
    when(k % 11 === 0, "07B00442")
      .otherwise(concat(lit("MA"), lpad((k % 97).cast(StringType), 2, "0")))
      .as("Matrix Account"),
    col("plan_id").as("Client Account"),
    when(k % 59 === 0, "0000000000000")
      .when(k % 6 === 0,
        concat(substring(col("ssn_base"), 1, 3), lit("-"),
          substring(col("ssn_base"), 4, 2), lit("-"), substring(col("ssn_base"), 6, 4)))
      .when(k % 6 === 1, concat(col("ssn_base"), lit(".0")))
      .otherwise(col("ssn_base")).as("Participant SSN"),
    concat(col("first_name"), lit(" "), col("last_name")).as("Participant Name"),
    col("state_raw").as("Participant State"),
    g.cast(DoubleType).as("Gross Amount"),
    col("txn_date").as("Transaction Date"),
    when(k % 9 === 0, "Account Transfer")
      .when(k % 9 === 1, "Check  Distribution")
      .when(k % 9 === 2, "Check Distribution")
      .when(k % 9 === 3, "ACH Distribution")
      .when(k % 9 === 4, "Wire Transfer")
      .when(k % 9 === 5, "Check Distribution")
      .when(k % 9 === 6, "check distribution")
      .when(k % 9 === 7, "Suspense Transfer")
      .otherwise("Check Distribution").as("Transaction Type"),
    when(k % 8 === 0, "7").when(k % 8 === 1, "4 - Death").when(k % 8 === 2, "G - Rollover")
      .when(k % 8 === 3, "1 - Early").when(k % 8 === 4, "2").when(k % 8 === 5, "B - Roth")
      .when(k % 8 === 6, "G").otherwise("H").as("Tax Code"),
    when(k % 6 === 0, lit(null).cast(StringType)).when(k % 6 === 1, "G")
      .when(k % 6 === 2, "4").when(k % 6 === 3, "H").when(k % 6 === 4, "")
      .otherwise("7").as("Tax Code 2"),
    when(k % 5 === 0, "1099-R").when(k % 5 === 1, "No Tax").when(k % 5 === 2, "1099R")
      .when(k % 5 === 3, "W-2").otherwise(lit(null).cast(StringType)).as("Tax Form"),
    when(k % 4 === 0, "Rollover").when(k % 4 === 1, " ROLLOVER ")
      .when(k % 4 === 2, "No Withholding").otherwise(lit(null).cast(StringType))
      .as("Federal Taxing Method"),
    when(k % 3 === 0, "Normal").when(k % 3 === 1, "Rollover").otherwise("Death")
      .as("Distribution Type"),
    txnIdCol.as("Transaction Id"),
    when(k % 6 === 0, lit(null).cast(DoubleType))
      .when(k % 6 === 1, lit(0.0))
      .when(k % 6 === 2, (g * 2).cast(DoubleType))
      .when(k % 6 === 3, floor((g * 4) / 5).cast(DoubleType))
      .when(k % 6 === 4, g.cast(DoubleType))
      .otherwise(floor((g * 9) / 10).cast(DoubleType)).as("Fed Taxable Amount"),
    when(k % 7 === 0, lit(null).cast(DoubleType))
      .otherwise((lit(2014.0) + (k % 7).cast(DoubleType))).as("Roth Initial Contribution Year"),
    ingest.as("_ingest_id"))

  /** Raw Matrix export rows (twin: `matrix_raw`). */
  def matrixRaw(spark: SparkSession, dir: String): DataFrame = {
    val b = base(spark, dir).filter(k % 31 =!= 0)
    val mainTxnId =
      when(k % 6 === 0, k.cast(StringType))
        .when(k % 6 === 1, concat(k.cast(StringType), lit(".0")))
        .when(k % 6 === 2, concat(lit("TX"), k.cast(StringType)))
        .when(k % 6 === 3, concat(lit(" "), k.cast(StringType), lit(" ")))
        .when(k % 6 === 4, concat(k.cast(StringType), lit("-9")))
        .otherwise(lit(null).cast(StringType))
    val main = b.select(matrixCols(mainTxnId, k): _*)
    val dups = b.filter(k % 43 === 0)
      .select(matrixCols(concat(lit("999"), k.cast(StringType)), k + 100000000L): _*)
    main.unionAll(dups)
  }

  private def demoCols(dobShiftDays: Column, ingest: Column): Seq[Column] = {
    val dob = date_add(to_date(lit("1945-01-01")),
      (((c * 13) % 18263) + dobShiftDays).cast(IntegerType))
    Seq(
      col("plan_id").as("PLANID"),
      col("ssn_base").as("SSNUM"),
      col("first_name").as("FIRSTNAM"),
      col("last_name").as("LASTNAM"),
      dob.as("BIRTHDATE"),
      when(c % 3 === 0, lit(null).cast(DateType))
        .otherwise(date_add(dob, (lit(18000L) + (c % 4000)).cast(IntegerType)))
        .as("TERM_DATE"),
      ingest.as("_ingest_id"))
  }

  /** Raw demographics rows (twin: `demo_raw`); dup rows shift dob by one day
    * and must win the keep-last dedup (D2).
    */
  def demoRaw(spark: SparkSession, dir: String): DataFrame = {
    val b = base(spark, dir).filter(k % 5 =!= 4)
    val main = b.select(demoCols(lit(0L), k): _*)
    val dups = b.filter(k % 23 === 0).select(demoCols(lit(1L), k + 100000000L): _*)
    main.unionAll(dups)
  }

  private def basisCols(yearCol: Column, totalCol: Column, ingest: Column): Seq[Column] = Seq(
    col("plan_id").as("PLANID"),
    col("ssn_base").as("SSNUM"),
    col("first_name").as("FIRSTNAM"),
    col("last_name").as("LASTNAM"),
    yearCol.as("FIRSTTAXYEARROTH"),
    totalCol.as("Total"),
    ingest.as("_ingest_id"))

  /** Raw Roth-basis rows (twin: `basis_raw`); dup rows are all-null and must
    * lose the completeness dedup (D3).
    */
  def basisRaw(spark: SparkSession, dir: String): DataFrame = {
    val b = base(spark, dir).filter(k % 2 === 0)
    val yearRaw =
      when(c % 6 === 0, lit(null).cast(DoubleType))
        .when(c % 6 === 1, lit(2012.0)).when(c % 6 === 2, lit(2018.0))
        .when(c % 6 === 3, lit(1800.0)).when(c % 6 === 4, lit(2020.0))
        .otherwise(lit(2021.5))
    val totalRaw =
      when(c % 5 === 0, lit(null).cast(DoubleType))
        .otherwise(((c * 7) % 5000).cast(DoubleType))
    val main = b.select(basisCols(yearRaw, totalRaw, k): _*)
    val dups = b.filter(k % 29 === 0).select(basisCols(
      lit(null).cast(DoubleType), lit(null).cast(DoubleType), k + 100000000L): _*)
    main.unionAll(dups)
  }

  // --- Cleaned inputs (deterministic `today`), memoized + persisted so the
  // many engine/summary queries stacked on top materialize each once.

  def cleanRelius(spark: SparkSession, dir: String): DataFrame =
    Registry.memo(spark, dir, "clean_relius")(
      CleanRelius(reliusRaw(spark, dir), today = Today))

  def cleanMatrix(spark: SparkSession, dir: String): DataFrame =
    Registry.memo(spark, dir, "clean_matrix")(
      CleanMatrix(matrixRaw(spark, dir), today = Today))

  def cleanDemo(spark: SparkSession, dir: String): DataFrame =
    Registry.memo(spark, dir, "clean_demo")(
      CleanReliusDemo(demoRaw(spark, dir), today = Today))

  def cleanBasis(spark: SparkSession, dir: String): DataFrame =
    Registry.memo(spark, dir, "clean_basis")(
      CleanRothBasis(basisRaw(spark, dir)))
}
