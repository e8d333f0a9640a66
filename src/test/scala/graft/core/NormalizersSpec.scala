package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit tests for the normalizer expression library, mirroring the
  * reference's pure-function tests (tests/validators/test_validators.py,
  * tests/roth_taxable/test_normalizers_roth_helpers.py) plus the quirk
  * cases called out in SURVEY §7.5.
  */
class NormalizersSpec extends SparkSpec {
  import spark.implicits._

  private def runString(c: org.apache.spark.sql.Column, inputs: Seq[String]): Seq[Option[String]] =
    inputs.toDF("v").select(c.as("r")).collect().toSeq.map(r => Option(r.getString(0)))

  test("F1 normalizeSsn: pad, strip non-digits, float artifact, null on >9 or empty") {
    val got = runString(
      Normalizers.normalizeSsn(col("v")),
      Seq("123456789", "123-45-6789", "1234567", "123456789.0", "12345678901",
        "", "abc", null, " 040511830 ", "40511830.0"))
    assert(got === Seq(
      Some("123456789"), Some("123456789"), Some("001234567"), Some("123456789"),
      None, None, None, None, Some("040511830"), Some("040511830")))
  }

  test("F10 normalizeTaxCode: leading 1-2 alphanumerics, uppercased") {
    val got = runString(
      Normalizers.normalizeTaxCode(col("v")),
      Seq("7 - Normal Distributions", "G - Rollover", "11 - Loan", "  h", "", "--", null))
    assert(got === Seq(Some("7"), Some("G"), Some("11"), Some("H"), None, None, None))
  }

  test("F13 normalizeTransactionId: float artifact, digits, letters null, strip non-digits") {
    val got = runString(
      Normalizers.normalizeTransactionId(col("v")),
      Seq("44324568.0", "44324568", "44-32", "TX123", "", null, "12.5", "..."))
    // "12.5" has no letters; digits stripped -> "125"
    assert(got === Seq(Some("44324568"), Some("44324568"), Some("4432"), None,
      None, None, Some("125"), None))
  }

  test("F14 classifyReliusDistType incl. truthy-constant quirk") {
    val got = runString(
      Normalizers.classifyReliusDistType(col("v")),
      Seq("Rollover", "Partial Rollover - Net", "RMD ACH",
        "Partial liquidation gross ACH", "Recurring payment",
        "Full Liquidation", "Partial something", "weird", null))
    assert(got === Seq(Some("rollover"), Some("partial_rollover"), Some("rmd"),
      Some("partial_cash"), Some("partial_cash"), Some("final_cash"),
      Some("partial_cash"), Some("other"), Some("other")))
  }

  test("F5 attainedAgeByYearEnd: 59.5 rule with null handling") {
    val df = Seq(
      ("1960-06-30", Some(2020)), // 59.5 reached 2019-12-30 -> true by 2020-12-31
      ("1960-07-02", Some(2019)), // 59.5 on 2020-01-02 -> false by 2019-12-31
      (null, Some(2020)),
      ("1960-06-30", None)).toDF("dob", "yr")
    val got = df.select(
      Normalizers.attainedAgeByYearEnd(col("dob"), col("yr"), 59, 6).as("r"))
      .collect().toSeq.map(_.getBoolean(0))
    assert(got === Seq(true, false, false, false))
  }

  test("F15 fullName: trim, null fill, empty -> null") {
    val df = Seq(("Ava", "Nguyen"), (" Bo ", null), (null, null), ("", ""))
      .toDF("f", "l")
    val got = df.select(Normalizers.fullName(col("f"), col("l")).as("r"))
      .collect().toSeq.map(r => Option(r.getString(0)))
    assert(got === Seq(Some("Ava Nguyen"), Some("Bo"), None, None))
  }

  test("F17 computeStartYear: integral-only, first non-null wins") {
    val df = Seq(
      (Some(2016.0), Some(2018.0)),
      (Some(2016.5), Some(2018.0)),
      (None, Some(2018.0)),
      (None: Option[Double], None: Option[Double])).toDF("first", "init")
    val got = df.select(Normalizers.computeStartYear(col("first"), col("init")).as("r"))
      .collect().toSeq.map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got === Seq(Some(2016L), Some(2018L), Some(2018L), None))
  }

  test("F18 combinedTaxCode") {
    val df = Seq(("4", "G"), ("4", null), (null, "G"), ("", "g"), (" b ", " 4 "))
      .toDF("s1", "s2")
    val got = df.select(Normalizers.combinedTaxCode(col("s1"), col("s2")).as("r"))
      .collect().toSeq.map(r => Option(r.getString(0)))
    assert(got === Seq(Some("4G"), Some("4"), None, None, Some("B4")))
  }

  test("P6/P7 roth and ira plan predicates") {
    val df = Seq("300005A", "ABCR", "300001XYZ", "MYIRA1", "zzz", null).toDF("v")
    val got = df.select(
      Normalizers.isRothPlan(col("v")).as("roth"),
      Normalizers.isIraPlan(col("v")).as("ira"))
      .collect().toSeq.map(r => (r.getBoolean(0), r.getBoolean(1)))
    assert(got === Seq(
      (true, true),   // 300005 prefix: roth prefix + ira prefix
      (true, false),  // ends with R
      (false, true),  // 300001 prefix
      (false, true),  // contains IRA
      (false, false),
      (false, false)))
  }

  test("F19/F20/F21 action token split, append-where, reason join") {
    val df = Seq(("update_1099\n\n investigate "), (null: String)).toDF("v")
    val toks = df.select(Normalizers.actionTokens(col("v")).as("r"))
      .collect().toSeq.map(_.getSeq[String](0))
    assert(toks === Seq(Seq("UPDATE_1099", "INVESTIGATE"), Seq()))

    val df2 = Seq((Seq("a"), true), (Seq("a"), false), (Seq.empty[String], true))
      .toDF("arr", "m")
    val appended = df2.select(
      Normalizers.appendWhere(col("arr"), col("m"), "tok").as("r"))
      .collect().toSeq.map(_.getSeq[String](0))
    assert(appended === Seq(Seq("a", "tok"), Seq("a"), Seq("tok")))

    val joined = Seq(Seq("r1", "r2"), Seq.empty[String]).toDF("arr")
      .select(Normalizers.joinReasons(col("arr")).as("r"))
      .collect().toSeq.map(r => Option(r.getString(0)))
    assert(joined === Seq(Some("- r1\n- r2"), None))
  }
}
