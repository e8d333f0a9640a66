package graft.core

import java.sql.Date
import java.time.LocalDate

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S9 — seeded deterministic sample-data generator for all four inputs,
  * with planted edge rows and a join-coverage self-check (SURVEY §2.1 S9;
  * reference `/root/reference/src/core/generate_sample_data.py:45-677`).
  *
  * Generation happens on the driver (sample scale is tiny by design, like
  * the reference's ~100-row fixtures) and is parallelized into DataFrames;
  * the planted edges (future date, negative amount, bogus code, invalid
  * dob, year 1800, negative basis, blocklisted account/method) mirror
  * generate_sample_data.py:280-307,364-418,494-509,517-536.
  */
object GenerateSampleData {

  final case class Sample(
      relius: DataFrame, matrix: DataFrame, demo: DataFrame, basis: DataFrame)

  private val Plans = Seq("300004PLAT", "300004MBD", "300004MBDII",
    "300005A", "200777R", "300001IRA", "200100")

  def apply(spark: SparkSession, nBase: Int = 100, seed: Long = 20250214L): Sample = {
    val rnd = new Random(seed)
    val base = LocalDate.of(2025, 1, 15)

    final case class Txn(
        plan: String, ssn: String, first: String, last: String, state: String,
        gross: Double, exported: LocalDate, txnDate: LocalDate,
        code1: String, code2: String, distName: String, txnMethod: String,
        account: String, tid: String, fedTaxable: java.lang.Double,
        taxForm: String, ftm: String)

    val txns = (0 until nBase).map { i =>
      val plan = Plans(rnd.nextInt(Plans.length))
      val ssn = f"${100000000 + rnd.nextInt(800000000)}%09d"
      val gross = (100 + rnd.nextInt(90000)).toDouble
      val exported = base.plusDays(rnd.nextInt(300).toLong)
      val lag = rnd.nextInt(14)
      Txn(plan, ssn, s"First$i", s"Last$i",
        Seq("CA", "NY", "TX", "FL", "WA")(rnd.nextInt(5)),
        gross, exported, exported.plusDays(lag.toLong),
        Seq("7", "4", "G", "1", "2", "B")(rnd.nextInt(6)),
        Seq(null, "G", "4", "H")(rnd.nextInt(4)),
        Seq("Rollover to IRA", "Partial Rollover", "RMD Distribution",
          "Full Liquidation", "Recurring Payment")(rnd.nextInt(5)),
        "Check Distribution",
        s"MA${rnd.nextInt(90) + 10}", (44000000 + i).toString,
        if (rnd.nextInt(5) == 0) null else Double.box(gross * 0.8),
        Seq("1099-R", "No Tax")(rnd.nextInt(2)),
        Seq("Rollover", "No Withholding")(rnd.nextInt(2)))
    }

    import spark.implicits._

    // Planted edge rows (kept in raw form; cleaners must flag/drop them).
    val reliusRows = txns.map(t =>
      (t.plan, t.ssn, t.first, t.last, t.state, t.gross,
        Date.valueOf(t.exported), t.exported.getYear.toLong, t.code1,
        t.distName)) ++ Seq(
      ("300004PLAT", "12345", "Edge", "FutureDate", "CA", 500.0,
        Date.valueOf("2099-01-01"), 2099L, "7", "RMD Distribution"),
      ("300004MBD", "999999999", "Edge", "NegAmount", "NY", -100.0,
        Date.valueOf("2025-02-01"), 2025L, "ZZ", "Partial Liquidation"))
    val relius = reliusRows.toDF("PLANID_1", "SSNUM_1", "FIRSTNAM", "LASTNAM",
      "STATEADDR", "GROSSDISTRAMT", "EXPORTEDDATE", "TAXYR", "DISTR1CD",
      "DISTRNAM")

    val matrixRows = txns.map(t =>
      (t.account, t.plan, t.ssn, s"${t.first} ${t.last}", t.state, t.gross,
        Date.valueOf(t.txnDate), t.txnMethod, t.code1, t.code2, t.taxForm,
        t.ftm, "Normal", t.tid, t.fedTaxable,
        Double.box(2015.0 + (t.tid.hashCode & 3)))) ++ Seq(
      ("07B00442", "300004PLAT", "123456780", "Blocked Account", "CA", 100.0,
        Date.valueOf("2025-03-01"), "Check Distribution", "7", null, "1099-R",
        "Rollover", "Normal", "90001", Double.box(80.0), Double.box(2016.0)),
      ("MA10", "300004PLAT", "123456781", "Blocked Method", "CA", 100.0,
        Date.valueOf("2025-03-01"), "Account Transfer", "7", null, "1099-R",
        "Rollover", "Normal", "90002", Double.box(80.0), Double.box(2016.0)))
    val matrix = matrixRows.toDF("Matrix Account", "Client Account",
      "Participant SSN", "Participant Name", "Participant State",
      "Gross Amount", "Transaction Date", "Transaction Type", "Tax Code",
      "Tax Code 2", "Tax Form", "Federal Taxing Method", "Distribution Type",
      "Transaction Id", "Fed Taxable Amount", "Roth Initial Contribution Year")

    val demoRows = txns.map { t =>
      val dob = base.minusYears(30L + math.abs(t.ssn.hashCode % 45))
      (t.plan, t.ssn, t.first, t.last, Date.valueOf(dob),
        if (t.ssn.hashCode % 3 == 0) null
        else Date.valueOf(dob.plusYears(50L)))
    } ++ Seq(
      ("300004PLAT", "123456782", "Edge", "BadDob", null, null))
    val demo = demoRows.toDF("PLANID", "SSNUM", "FIRSTNAM", "LASTNAM",
      "BIRTHDATE", "TERM_DATE")

    val basisRows = txns.filter(_.plan.startsWith("30000")).take(30).map { t =>
      (t.plan, t.ssn, t.first, t.last,
        Double.box(2010.0 + math.abs(t.ssn.hashCode % 12)),
        Double.box(math.abs(t.ssn.hashCode % 5000).toDouble))
    } ++ Seq(
      ("300005A", "123456783", "Edge", "Ancient", Double.box(1800.0),
        Double.box(-50.0)))
    val basis = basisRows.toDF("PLANID", "SSNUM", "FIRSTNAM", "LASTNAM",
      "FIRSTTAXYEARROTH", "Total")

    Sample(relius, matrix, demo, basis)
  }

  /** J5 — join-coverage self-check: fraction of Relius rows with a Matrix
    * partner on the match keys (reference generate_sample_data.py:589-599).
    */
  def joinCoverage(sample: Sample): Double = {
    import org.apache.spark.sql.functions._
    val r = sample.relius.select(
      col("PLANID_1").as("plan"), col("SSNUM_1").as("ssn"),
      col("GROSSDISTRAMT").as("gross"))
    val m = sample.matrix.select(
      col("Client Account").as("plan"), col("Participant SSN").as("ssn"),
      col("Gross Amount").as("gross"), lit(true).as("_in_m"))
      .dropDuplicates("plan", "ssn", "gross")
    val joined = r.join(m, Seq("plan", "ssn", "gross"), "left")
    joined.agg(avg(when(col("_in_m").isNotNull, 1.0).otherwise(0.0)))
      .head().getDouble(0)
  }
}
