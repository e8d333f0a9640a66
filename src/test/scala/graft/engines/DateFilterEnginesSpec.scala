package graft.engines

import java.time.LocalDate

import graft.SparkSpec
import graft.core.{Config, Validators}

/** Engine-level date filtering and plan-scope overrides, mirroring the
  * reference's `tests/pipelines/test_date_filter_engines_ab.py`,
  * `tests/roth_taxable/test_date_filter_roth_taxable.py`,
  * `tests/validators/test_apply_date_filter.py`, and
  * `tests/pipelines/test_reconcile_plan_scope_defaults.py`.
  */
class DateFilterEnginesSpec extends SparkSpec {
  import spark.implicits._

  private val janOnly = Config.DateFilterConfig(
    Some(LocalDate.of(2025, 1, 1)), Some(LocalDate.of(2025, 1, 31)), None)

  test("applyDateFilter: inclusive bounds, month sets, drops null dates") {
    val df = Seq(
      ("a", "2025-01-01"), ("b", "2025-01-31"), ("c", "2025-02-01"),
      ("d", null: String))
      .toDF("id", "d")
      .withColumn("d", org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("d")))

    val ranged = Validators.applyDateFilter(df, "d", janOnly)
      .select("id").collect().map(_.getString(0)).sorted
    assert(ranged.toSeq == Seq("a", "b")) // inclusive both ends, null dropped

    val monthly = Validators.applyDateFilter(df, "d",
      Config.DateFilterConfig(None, None, Some(Set(2))))
      .select("id").collect().map(_.getString(0))
    assert(monthly.toSeq == Seq("c"))

    // Inactive config is a no-op (keeps the null-date row).
    assert(Validators.applyDateFilter(df, "d", Config.DateFilterConfig()).count() == 4)
  }

  test("Engine A: date filter excludes rows on both sides before the join") {
    val relius = Seq(
      ("300004PLAT", "111111111", 100.0, "2025-01-10", "rollover"),
      ("300004PLAT", "222222222", 50.0, "2025-02-10", "rollover"))
      .toDF("plan_id", "ssn", "gross_amt", "exported_date", "dist_category_relius")
      .withColumn("exported_date", org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("exported_date")))
    val matrix = Seq(
      ("300004PLAT", "111111111", 100.0, "2025-01-12", "t1", "7", ""),
      ("300004PLAT", "222222222", 50.0, "2025-02-12", "t2", "7", ""))
      .toDF("plan_id", "ssn", "gross_amt", "txn_date", "transaction_id",
        "tax_code_1", "tax_code_2")
      .withColumn("txn_date", org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("txn_date")))

    val out = MatchPlanId.reconcile(relius, matrix, dateFilter = janOnly)
      .select("ssn").collect().map(_.getString(0))
    assert(out.toSeq == Seq("111111111")) // Feb rows filtered on both sides
  }

  test("Engine B: date filter excludes out-of-range transactions") {
    val matrix = Seq(
      ("200001A", "123456780", "2025-01-15", "t1", "Alex", "a1", "7", ""),
      ("200001A", "123456780", "2025-03-15", "t2", "Alex", "a1", "7", ""))
      .toDF("plan_id", "ssn", "txn_date", "transaction_id", "participant_name",
        "matrix_account", "tax_code_1", "tax_code_2")
    val demo = Seq(("200001A", "123456780", "1971-07-01", null: String, "A", "T"))
      .toDF("plan_id", "ssn", "dob", "term_date", "first_name", "last_name")

    val out = AgeTaxCode.run(matrix, demo, dateFilter = janOnly)
      .select("transaction_id").collect().map(_.getString(0))
    assert(out.toSeq == Seq("t1"))
  }

  test("Engine C: date filter excludes out-of-range transactions") {
    val matrix = Seq(
      ("300005A", "123456780", "2025-01-15", "t1", "R", "a", 100.0, 80.0, 2016, "B", "G"),
      ("300005A", "123456780", "2025-06-15", "t2", "R", "a", 100.0, 80.0, 2016, "B", "G"))
      .toDF("plan_id", "ssn", "txn_date", "transaction_id", "participant_name",
        "matrix_account", "gross_amt", "fed_taxable_amt",
        "roth_initial_contribution_year", "tax_code_1", "tax_code_2")
    val demo = Seq(("300005A", "123456780", "1960-01-01", null: String))
      .toDF("plan_id", "ssn", "dob", "term_date")
    val basis = Seq(("300005A", "123456780", 2016, 500.0))
      .toDF("plan_id", "ssn", "first_roth_tax_year", "roth_basis_amt")

    val out = RothTaxable.run(matrix, demo, basis, dateFilter = janOnly)
      .select("transaction_id").collect().map(_.getString(0))
    assert(out.toSeq == Seq("t1"))
  }

  test("Engine A plan scope: default inherited set, custom override, None = all") {
    val relius = Seq(
      ("300004PLAT", "111111111", 100.0, "2025-01-01", "rollover"),
      ("999999X", "222222222", 50.0, "2025-01-01", "rollover"))
      .toDF("plan_id", "ssn", "gross_amt", "exported_date", "dist_category_relius")
    val matrix = Seq(
      ("300004PLAT", "111111111", 100.0, "2025-01-05", "t1", "7", ""),
      ("999999X", "222222222", 50.0, "2025-01-05", "t2", "7", ""))
      .toDF("plan_id", "ssn", "gross_amt", "txn_date", "transaction_id",
        "tax_code_1", "tax_code_2")

    val defaults = MatchPlanId.reconcile(relius, matrix)
      .select("plan_id").collect().map(_.getString(0)).distinct
    assert(defaults.toSeq == Seq("300004PLAT"))

    val custom = MatchPlanId.reconcile(relius, matrix,
      planIds = Some(Set("999999X")))
      .select("plan_id", "match_status").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(custom.toSeq == Seq(("999999X", "match_no_action")))
    // Non-inherited plan: no expectations, so in-window match -> no action.

    val all = MatchPlanId.reconcile(relius, matrix, planIds = None)
      .select("plan_id").collect().map(_.getString(0)).distinct.sorted
    assert(all.toSeq == Seq("300004PLAT", "999999X"))
  }
}
