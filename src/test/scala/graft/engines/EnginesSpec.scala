package graft.engines

import graft.SparkSpec
import graft.outputs.BuildCorrectionFile
import org.apache.spark.sql.Row

/** Engine behavior tests on inline micro-frames, mirroring the reference's
  * `tests/pipelines/test_new_tax_code_unified.py` cases.
  */
class EnginesSpec extends SparkSpec {
  import spark.implicits._

  private def firstRow(df: org.apache.spark.sql.DataFrame): Row = {
    val rows = df.collect()
    assert(rows.length === 1, s"expected 1 row, got ${rows.length}")
    rows.head
  }

  test("Engine A: inherited rollover mis-coded 7 -> new_tax_code 4G") {
    val relius = Seq(("300004PLAT", "123456780", 100.0, "2025-01-01", "rollover"))
      .toDF("plan_id", "ssn", "gross_amt", "exported_date", "dist_category_relius")
    val matrix = Seq(("300004PLAT", "123456780", 100.0, "2025-01-05", "tx1", "7", ""))
      .toDF("plan_id", "ssn", "gross_amt", "txn_date", "transaction_id",
        "tax_code_1", "tax_code_2")

    val r = firstRow(MatchPlanId.reconcile(relius, matrix))
    assert(r.getAs[String]("new_tax_code") === "4G")
    assert(r.getAs[String]("match_status") === "match_needs_correction")
    assert(r.getAs[String]("correction_reason") === "inherited_rollover_expected_G_and_4")
    assert(r.getAs[String]("action") === "UPDATE_1099")
  }

  test("Engine A: already 4/G -> no action, suggestions cleared") {
    val relius = Seq(("300004PLAT", "123456780", 100.0, "2025-01-01", "rollover"))
      .toDF("plan_id", "ssn", "gross_amt", "exported_date", "dist_category_relius")
    val matrix = Seq(("300004PLAT", "123456780", 100.0, "2025-01-05", "tx1b", "4", "G"))
      .toDF("plan_id", "ssn", "gross_amt", "txn_date", "transaction_id",
        "tax_code_1", "tax_code_2")

    val r = firstRow(MatchPlanId.reconcile(relius, matrix))
    assert(r.getAs[String]("match_status") === "match_no_action")
    assert(r.getAs[String]("suggested_tax_code_1") === null)
    assert(r.getAs[String]("suggested_tax_code_2") === null)
    assert(r.getAs[String]("new_tax_code") === null)
  }

  test("Engine A: out-of-window and unmatched statuses") {
    val relius = Seq(
      ("300004PLAT", "111111111", 100.0, "2025-01-01", "rollover"),
      ("300004PLAT", "222222222", 50.0, "2025-01-01", "rollover"))
      .toDF("plan_id", "ssn", "gross_amt", "exported_date", "dist_category_relius")
    val matrix = Seq(
      ("300004PLAT", "111111111", 100.0, "2025-03-01", "tx1", "7", ""),
      ("300004PLAT", "333333333", 75.0, "2025-01-05", "tx2", "7", ""))
      .toDF("plan_id", "ssn", "gross_amt", "txn_date", "transaction_id",
        "tax_code_1", "tax_code_2")

    val out = MatchPlanId.reconcile(relius, matrix)
      .select("ssn", "match_status").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("111111111") === "date_out_of_range")
    assert(out("222222222") === "unmatched_relius")
    assert(out("333333333") === "unmatched_matrix")
  }

  test("Engine B: under-55 no-term -> code 1") {
    val matrix = Seq(("200001A", "123456780", "2025-06-01", "tx2", "Alex", "acct2", "7", ""))
      .toDF("plan_id", "ssn", "txn_date", "transaction_id", "participant_name",
        "matrix_account", "tax_code_1", "tax_code_2")
    val demo = Seq(("200001A", "123456780", "1971-07-01", null: String, "Alex", "Tester"))
      .toDF("plan_id", "ssn", "dob", "term_date", "first_name", "last_name")

    val r = firstRow(AgeTaxCode.run(matrix, demo))
    assert(r.getAs[String]("new_tax_code") === "1")
    assert(r.getAs[String]("match_status") === "match_needs_correction")
  }

  test("Engine B: matching code 7 -> no action, reason cleared") {
    val matrix = Seq(("200001A", "123456780", "2025-06-01", "tx2b", "Alex", "acct2b", "7", ""))
      .toDF("plan_id", "ssn", "txn_date", "transaction_id", "participant_name",
        "matrix_account", "tax_code_1", "tax_code_2")
    val demo = Seq(("200001A", "123456780", "1960-01-01", null: String, "Alex", "Tester"))
      .toDF("plan_id", "ssn", "dob", "term_date", "first_name", "last_name")

    val r = firstRow(AgeTaxCode.run(matrix, demo))
    assert(r.getAs[String]("match_status") === "match_no_action")
    assert(r.getAs[String]("correction_reason") === null)
    assert(r.getAs[String]("suggested_tax_code_1") === null)
    assert(r.getAs[String]("new_tax_code") === null)
  }

  private def rothMatrix(
      txnId: String, acct: String, gross: Double, fedTaxable: Double,
      initYear: Int, code1: String, code2: String) =
    Seq(("300005A", "123456780", "2025-03-01", txnId, "Roth", acct, gross,
      fedTaxable, initYear, code1, code2))
      .toDF("plan_id", "ssn", "txn_date", "transaction_id", "participant_name",
        "matrix_account", "gross_amt", "fed_taxable_amt",
        "roth_initial_contribution_year", "tax_code_1", "tax_code_2")

  private def rothDemo(dob: String) =
    Seq(("300005A", "123456780", dob, null: String))
      .toDF("plan_id", "ssn", "dob", "term_date")

  private def rothBasis(firstYear: Int, basis: Double) =
    Seq(("300005A", "123456780", firstYear, basis))
      .toDF("plan_id", "ssn", "first_roth_tax_year", "roth_basis_amt")

  test("Engine C: B/G rollover fix -> new_tax_code H") {
    val r = firstRow(RothTaxable.run(
      rothMatrix("tx3", "acct3", 150.0, 50.0, 2015, "B", "G"),
      rothDemo("1970-01-01"), rothBasis(2010, 500.0)))
    assert(r.getAs[String]("new_tax_code") === "H")
  }

  test("Engine C: compliant row -> no action, everything cleared") {
    val r = firstRow(RothTaxable.run(
      rothMatrix("tx3b", "acct3b", 100.0, 0.0, 2010, "B", "1"),
      rothDemo("1980-01-01"), rothBasis(2010, 200.0)))
    assert(r.getAs[String]("match_status") === "match_no_action")
    assert(r.getAs[String]("correction_reason") === null)
    assert(r.getAs[String]("suggested_tax_code_1") === null)
    assert(r.getAs[String]("suggested_tax_code_2") === null)
    assert(r.getAs[String]("new_tax_code") === null)
    assert(r.isNullAt(r.fieldIndex("suggested_taxable_amt")))
  }

  test("Engine C: age-rule B1 expectation -> combined new_tax_code B1") {
    val result = RothTaxable.run(
      rothMatrix("tx5", "acct5", 150.0, 50.0, 2015, "7", ""),
      rothDemo("1978-01-01"), rothBasis(2010, 500.0))
    val r = firstRow(result)
    assert(r.getAs[String]("new_tax_code") === "B1")
    val corr = firstRow(BuildCorrectionFile.buildCorrectionDataFrame(result))
    assert(corr.getAs[String]("New Tax Code") === "B1")
  }

  test("Engine B -> correction file exports New Tax Code") {
    val matrix = Seq(("200001A", "123456780", "2025-06-01", "tx4", "Alex", "acct4", "7", ""))
      .toDF("plan_id", "ssn", "txn_date", "transaction_id", "participant_name",
        "matrix_account", "tax_code_1", "tax_code_2")
    val demo = Seq(("200001A", "123456780", "1971-07-01", null: String, "Alex", "Tester"))
      .toDF("plan_id", "ssn", "dob", "term_date", "first_name", "last_name")

    val corrections = BuildCorrectionFile.buildCorrectionDataFrame(
      AgeTaxCode.run(matrix, demo))
    assert(corrections.columns.contains("New Tax Code"))
    assert(!corrections.columns.contains("New Tax Code 1"))
    assert(firstRow(corrections).getAs[String]("New Tax Code") === "1")
  }

  test("correction file: taxable/year updates + investigate selection") {
    val analysis = Seq(
      ("match_needs_correction", "UPDATE_1099", Some(0.0), None: Option[Int], "tx_taxable_update", "2025-01-01", "123456780", "A", "acct1"),
      ("match_needs_correction", "UPDATE_1099\nINVESTIGATE", None, Some(2020), "tx_year_update", "2025-01-02", "123456781", "B", "acct2"),
      ("match_needs_correction", "INVESTIGATE", Some(10.0), None, "tx_investigate", "2025-01-03", "123456782", "C", "acct3"),
      ("match_needs_review", "UPDATE_1099", Some(5.0), Some(2020), "tx_review", "2025-01-04", "123456783", "D", "acct4"),
      ("match_needs_correction", "UPDATE_1099", None, None, "tx_no_suggestion", "2025-01-05", "123456784", "E", "acct5"))
      .toDF("match_status", "action", "suggested_taxable_amt",
        "suggested_first_roth_tax_year", "transaction_id", "txn_date", "ssn",
        "participant_name", "matrix_account")
      .withColumn("suggested_tax_code_1", org.apache.spark.sql.functions.lit(null: String))
      .withColumn("suggested_tax_code_2", org.apache.spark.sql.functions.lit(null: String))
      .withColumn("tax_code_1", org.apache.spark.sql.functions.lit("B"))
      .withColumn("tax_code_2", org.apache.spark.sql.functions.lit(""))
      .withColumn("correction_reason", org.apache.spark.sql.functions.lit("r"))

    val corrections = BuildCorrectionFile.buildCorrectionDataFrame(analysis)
    val byId = corrections.collect()
      .map(r => r.getAs[String]("Transaction Id") -> r).toMap
    assert(byId.keySet === Set("tx_taxable_update", "tx_year_update",
      "tx_investigate", "tx_review"))
    assert(byId("tx_taxable_update").getAs[Double]("New Taxable Amount") === 0.0)
    assert(byId("tx_year_update").getAs[Int]("New First Year contrib") === 2020)
    assert(byId("tx_investigate").getAs[Double]("New Taxable Amount") === 10.0)
    assert(byId("tx_review").getAs[Double]("New Taxable Amount") === 5.0)
    assert(byId("tx_review").getAs[Int]("New First Year contrib") === 2020)
  }

  test("Engine D: classification + reasons") {
    val matrix = Seq(
      // FTM rollover + NoTax -> no action
      ("300001A", "Check Distribution", "Rollover", "No Tax", "t1", "2025-01-01", "111111111", "a1", "G", "", "P1"),
      // FTM rollover + 1099-R -> needs correction, code 0
      ("300001A", "Check Distribution", "Rollover", "1099-R", "t2", "2025-01-02", "222222222", "a2", "G", "", "P2"),
      // missing FTM -> review with reason
      ("300001A", "Check Distribution", null, "1099-R", "t3", "2025-01-03", "333333333", "a3", "", "H", "P3"),
      // non-IRA plan filtered out
      ("200001A", "Check Distribution", "Rollover", "No Tax", "t4", "2025-01-04", "444444444", "a4", "G", "", "P4"),
      // wrong txn method filtered out
      ("300001A", "ACH", "Rollover", "No Tax", "t5", "2025-01-05", "555555555", "a5", "G", "", "P5"),
      // no rollover code filtered out
      ("300001A", "Check Distribution", "Rollover", "No Tax", "t6", "2025-01-06", "666666666", "a6", "7", "", "P6"))
      .toDF("plan_id", "txn_method", "federal_taxing_method", "tax_form",
        "transaction_id", "txn_date", "ssn", "matrix_account", "tax_code_1",
        "tax_code_2", "participant_name")

    val out = IraRollover.run(matrix).collect()
      .map(r => r.getAs[String]("transaction_id") -> r).toMap
    assert(out.keySet === Set("t1", "t2", "t3"))
    assert(out("t1").getAs[String]("match_status") === "match_no_action")
    assert(out("t1").getAs[String]("correction_reason") === null)
    assert(out("t2").getAs[String]("match_status") === "match_needs_correction")
    assert(out("t2").getAs[String]("new_tax_code") === "0")
    assert(out("t2").getAs[String]("action") === "UPDATE_1099")
    assert(out("t3").getAs[String]("match_status") === "match_needs_review")
    assert(out("t3").getAs[String]("action") === "INVESTIGATE")
    assert(out("t3").getAs[String]("correction_reason") === "missing_federal_taxing_method")
  }

  test("split corrections by action duplicates dual-action rows") {
    val corrections = Seq(
      ("t1", "UPDATE_1099"),
      ("t2", "UPDATE_1099\nINVESTIGATE"),
      ("t3", "INVESTIGATE"))
      .toDF("Transaction Id", "Action")
    val split = BuildCorrectionFile.splitCorrectionsByAction(corrections)
    val corr = split("Correction").collect().map(_.getString(0)).toSet
    val inv = split("Investigate").collect().map(_.getString(0)).toSet
    assert(corr === Set("t1", "t2"))
    assert(inv === Set("t2", "t3"))
    assert(split("Correction").select("Action").collect().forall(_.getString(0) == "UPDATE_1099"))
  }
}
