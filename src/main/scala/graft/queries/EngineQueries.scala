package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.engines.{AgeTaxCode, IraRollover, MatchPlanId, RothTaxable}
import graft.outputs.BuildCorrectionFile

/** Engine A–D pipelines + cleaners over the testdata adapter (SURVEY
  * §2.2–§2.9), each with a DuckDB oracle replaying the same semantics.
  *
  * Output conventions (shared with OracleSql): dates as 'yyyy-MM-dd'
  * strings, arrays '|'-joined, so both engines emit identical scalars.
  */
object EngineQueries {

  private def dstr(name: String): Column =
    date_format(col(name), "yyyy-MM-dd").as(name)

  // sessionUUID-keyed like Registry.memoCache (a recycled identity hash
  // could otherwise hand a new session the old session's catalog name).
  private val bucketedDone =
    scala.collection.concurrent.TrieMap.empty[(String, String), String]

  /** Bucketed-storage inputs for the reconcile: the cleaned Relius and
    * Matrix frames written ONCE per (session, SF) to catalog tables
    * bucketed AND sorted on the full match key (plan_id, ssn, gross_amt),
    * then read back through the catalog so the planner sees the bucket
    * layout. With both sides bucketed identically on the join keys, the
    * full-outer sort-merge join needs NO exchange at all
    * (PlanSpec-asserted) — the materialized co-location contract that
    * turns the repo's biggest shuffle (`ea_reconcile_all`'s corpus-wide
    * SMJ) into a local merge at 100 TB, amortized across every downstream
    * run that reads the bucketed layout.
    */
  private def bucketedInputs(
      s: org.apache.spark.sql.SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    // Spark 3.3+ only accepts subset co-partitioning (children partitioned
    // on a common PREFIX of the join keys) when this is off; with it on,
    // the planner demands all three keys — including the float one it
    // normalizes, which no bucket layout can ever provide — and silently
    // re-shuffles both bucketed sides.
    s.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    val db = bucketedDone.getOrElseUpdate(
      (Registry.sessionId(s), dir), {
        val name = "graft_bkt_" + math.abs(dir.hashCode).toString
        // The in-memory catalog forgets tables across JVMs but their
        // warehouse directories persist; clear any stale location or
        // saveAsTable refuses with LOCATION_ALREADY_EXISTS.
        s.sql(s"DROP DATABASE IF EXISTS $name CASCADE")
        val wh = s.conf.get("spark.sql.warehouse.dir")
        val dbPath = new org.apache.hadoop.fs.Path(wh, name + ".db")
        val fs = dbPath.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(dbPath)) fs.delete(dbPath, true)
        s.sql(s"CREATE DATABASE $name")
        // Bucket on the STRING prefix of the match key: a double bucket
        // column can never match the join's requirement (Spark wraps
        // float join keys in NaN/-0.0 normalization, so the planner
        // disables bucketing — observed live); partitioning on the same
        // (plan_id, ssn) subset on BOTH sides still satisfies the
        // 3-key join's clustered distribution, which is what kills the
        // exchange. The in-bucket sort covers the same prefix, so the
        // SMJ only adds a cheap per-bucket sort on the residual key.
        Testdata.cleanRelius(s, dir).write.mode("overwrite")
          .bucketBy(8, "plan_id", "ssn")
          .sortBy("plan_id", "ssn")
          .saveAsTable(s"$name.relius_b")
        Testdata.cleanMatrix(s, dir).write.mode("overwrite")
          .bucketBy(8, "plan_id", "ssn")
          .sortBy("plan_id", "ssn")
          .saveAsTable(s"$name.matrix_b")
        name
      })
    (s.table(s"$db.relius_b"), s.table(s"$db.matrix_b"))
  }

  private def issuesStr(name: String = "validation_issues"): Column =
    concat_ws("|", col(name)).as(name)

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "clean_relius",
      (s, dir) =>
        Testdata.cleanRelius(s, dir).select(
          col("plan_id"), col("ssn"), col("first_name"), col("last_name"),
          col("state"), col("gross_amt"), dstr("exported_date"), col("tax_year"),
          col("dist_code_1"), col("dist_name"), col("dist_category_relius"),
          col("full_name"), col("ssn_valid"), col("amount_valid"),
          col("date_valid"), col("code_1099r_valid"), issuesStr()),
      Some(OracleSql.query(
        """SELECT plan_id, ssn, first_name, last_name, state, gross_amt,
          |  strftime(exported_date, '%Y-%m-%d') AS exported_date, tax_year,
          |  dist_code_1, dist_name, dist_category_relius, full_name,
          |  ssn_valid, amount_valid, date_valid, code_1099r_valid,
          |  coalesce(array_to_string(validation_issues, '|'), '') AS validation_issues
          |FROM relius_clean""".stripMargin))),

    QueryDef(
      "clean_matrix",
      (s, dir) =>
        Testdata.cleanMatrix(s, dir).select(
          col("plan_id"), col("ssn"), col("participant_name"), col("state"),
          col("gross_amt"), col("fed_taxable_amt"), dstr("txn_date"),
          col("txn_method"), col("tax_code_1"), col("tax_code_2"),
          col("tax_form"), col("federal_taxing_method"), col("dist_type"),
          col("roth_initial_contribution_year"), col("transaction_id"),
          col("matrix_account"), col("ssn_valid"), col("amount_valid"),
          col("date_valid"), col("code_1099r_valid"), issuesStr()),
      Some(OracleSql.query(
        """SELECT plan_id, ssn, participant_name, state, gross_amt,
          |  fed_taxable_amt, strftime(txn_date, '%Y-%m-%d') AS txn_date,
          |  txn_method, tax_code_1, tax_code_2, tax_form, federal_taxing_method,
          |  dist_type, roth_initial_contribution_year, transaction_id,
          |  matrix_account, ssn_valid, amount_valid, date_valid,
          |  code_1099r_valid,
          |  coalesce(array_to_string(validation_issues, '|'), '') AS validation_issues
          |FROM matrix_clean""".stripMargin))),

    QueryDef(
      "clean_demo",
      (s, dir) =>
        Testdata.cleanDemo(s, dir).select(
          col("plan_id"), col("ssn"), col("first_name"), col("last_name"),
          dstr("dob"), dstr("term_date"), col("ssn_valid"),
          col("date_valid").cast("string").as("date_valid"),
          issuesStr()),
      Some(OracleSql.query(
        """SELECT plan_id, ssn, first_name, last_name,
          |  strftime(dob, '%Y-%m-%d') AS dob,
          |  strftime(term_date, '%Y-%m-%d') AS term_date,
          |  ssn_valid, CAST(date_valid AS VARCHAR) AS date_valid,
          |  coalesce(array_to_string(list_filter([
          |    CASE WHEN ssn_valid = FALSE THEN 'ssn_invalid' END,
          |    CASE WHEN date_valid = FALSE THEN 'date_invalid' END],
          |    x -> x IS NOT NULL), '|'), '') AS validation_issues
          |FROM demo_clean""".stripMargin))),

    QueryDef(
      "clean_basis",
      (s, dir) =>
        Testdata.cleanBasis(s, dir).select(
          col("plan_id"), col("ssn"), col("first_name"), col("last_name"),
          col("first_roth_tax_year"), col("roth_basis_amt"),
          col("ssn_valid"), col("amount_valid"), issuesStr()),
      Some(OracleSql.query(
        """SELECT plan_id, ssn, first_name, last_name, first_roth_tax_year,
          |  roth_basis_amt,
          |  coalesce(regexp_matches(ssn, '^[0-9]{9}$')
          |    AND ssn NOT IN ('000000000','999999999','012345678','123456789')
          |    AND substr(ssn, 1, 3) NOT IN ('000','666')
          |    AND NOT starts_with(substr(ssn, 1, 3), '9'), FALSE) AS ssn_valid,
          |  coalesce(roth_basis_amt IS NOT NULL AND NOT (roth_basis_amt < 0)
          |    AND abs(roth_basis_amt) <= 10000000, FALSE) AS amount_valid,
          |  coalesce(array_to_string(list_filter([
          |    CASE WHEN NOT coalesce(regexp_matches(ssn, '^[0-9]{9}$')
          |      AND ssn NOT IN ('000000000','999999999','012345678','123456789')
          |      AND substr(ssn, 1, 3) NOT IN ('000','666')
          |      AND NOT starts_with(substr(ssn, 1, 3), '9'), FALSE)
          |      THEN 'ssn_invalid' END,
          |    CASE WHEN NOT coalesce(roth_basis_amt IS NOT NULL
          |      AND NOT (roth_basis_amt < 0)
          |      AND abs(roth_basis_amt) <= 10000000, FALSE)
          |      THEN 'amount_invalid' END],
          |    x -> x IS NOT NULL), '|'), '') AS validation_issues
          |FROM basis_clean""".stripMargin))),

    // FUZZY AMOUNT MATCHING for Engine A's unmatched rows — the manual
    // step a reconciliation analyst performs next ("is this a penny/
    // dollar-off keying error?") as a query: unmatched Relius rows
    // (anti-join on the exact (plan, ssn, gross) triple) band-join
    // candidate Matrix rows of the same participant within $1, keyed on
    // plan|ssn with the amount in exact integer cents as the band axis.
    // The join is spelled DECLARATIVELY (key equality + |band| <= w), so
    // RewriteRangeJoin's autoBroadcastJoinThreshold guard decides the
    // physical plan: when the distinct Matrix build side's size stat is
    // broadcastable it lowers to the native binary-search broadcast
    // operator; when it is not (the 100 TB case — the build side is
    // DATA-SIZED, it grows with the Matrix corpus), Spark plans the
    // shuffled equi-join on the high-cardinality plan|ssn key with the
    // band as a post-join filter, which is safe at any scale because
    // per-participant groups are tiny. (Until r13 this query called
    // NativeRangeJoin.bandJoin directly, i.e. an UNCONDITIONAL
    // driver-side collect of the corpus-sized build — the exact failure
    // SCALING.md's applicability rule forbids.) The adapter PLANTS these
    // near-misses (every 41st Relius gross is off by exactly $1), so the
    // report is non-vacuous at every scale; the oracle replays it as a
    // plain theta join over the same cleaned CTEs.
    QueryDef(
      "ea_fuzzy_match",
      (s, dir) => {
        val rel = Testdata.cleanRelius(s, dir)
        val mat = Testdata.cleanMatrix(s, dir)
        val unmatched = rel
          .join(mat.select("plan_id", "ssn", "gross_amt"),
            Seq("plan_id", "ssn", "gross_amt"), "left_anti")
          .select(col("plan_id"), col("ssn"), col("gross_amt"))
          .distinct()
        val l = unmatched.select(
          concat_ws("|", col("plan_id"), col("ssn")).as("match_key"),
          col("plan_id"), col("ssn"),
          (col("gross_amt") * 100).cast("long").as("r_cents"))
        val r = mat.select(
          concat_ws("|", col("plan_id"), col("ssn")).as("match_key_m"),
          (col("gross_amt") * 100).cast("long").as("m_cents"))
          .distinct()
        l.join(r, col("match_key") === col("match_key_m") &&
            abs(col("r_cents") - col("m_cents")) <= lit(100L))
          .select(col("plan_id"), col("ssn"), col("r_cents"),
            col("m_cents"), (col("m_cents") - col("r_cents")).as("diff_cents"))
      },
      Some(OracleSql.query(
        """SELECT r.plan_id, r.ssn,
          |  CAST(r.gross_amt * 100 AS BIGINT) AS r_cents,
          |  CAST(m.gross_amt * 100 AS BIGINT) AS m_cents,
          |  CAST(m.gross_amt * 100 - r.gross_amt * 100 AS BIGINT)
          |    AS diff_cents
          |FROM (SELECT DISTINCT plan_id, ssn, gross_amt FROM relius_clean r0
          |      WHERE NOT EXISTS (
          |        SELECT 1 FROM matrix_clean x
          |        WHERE x.plan_id = r0.plan_id AND x.ssn = r0.ssn
          |          AND x.gross_amt = r0.gross_amt)) r
          |JOIN (SELECT DISTINCT plan_id, ssn, gross_amt
          |      FROM matrix_clean) m
          |  ON r.plan_id = m.plan_id AND r.ssn = m.ssn
          |  AND abs(r.gross_amt * 100 - m.gross_amt * 100) <= 100"""
          .stripMargin))),

    QueryDef(
      "ea_reconcile",
      (s, dir) =>
        Registry.memo(s, dir, "summary_ea")(
          MatchPlanId.reconcile(Testdata.cleanRelius(s, dir), Testdata.cleanMatrix(s, dir)))
          .select(
            col("plan_id"), col("ssn"), col("gross_amt"), col("_merge"),
            dstr("exported_date"), dstr("txn_date"), col("tax_year"),
            col("dist_code_1"), col("dist_category_relius"), col("full_name"),
            col("tax_code_1"), col("tax_code_2"), col("transaction_id"),
            col("matrix_account"), col("participant_name"), col("fed_taxable_amt"),
            col("date_lag_days"), col("date_within_tolerance"),
            col("expected_tax_code_1"), col("expected_tax_code_2"),
            col("code_matches_expected"), col("needs_correction"),
            col("suggested_tax_code_1"), col("suggested_tax_code_2"),
            col("correction_reason"), col("action"), col("match_status"),
            col("new_tax_code")),
      Some(OracleSql.query(
        """SELECT plan_id, ssn, gross_amt, _merge,
          |  strftime(exported_date, '%Y-%m-%d') AS exported_date,
          |  strftime(txn_date, '%Y-%m-%d') AS txn_date,
          |  tax_year, dist_code_1, dist_category_relius, full_name,
          |  tax_code_1, tax_code_2, transaction_id, matrix_account,
          |  participant_name, fed_taxable_amt, date_lag_days,
          |  date_within_tolerance, expected_tax_code_1, expected_tax_code_2,
          |  code_matches_expected, needs_correction, suggested_tax_code_1,
          |  suggested_tax_code_2, correction_reason, action, match_status,
          |  new_tax_code
          |FROM ea""".stripMargin, OracleSql.EngineA))),

    QueryDef(
      "ea_correction_file",
      (s, dir) => {
        val ea = Registry.memo(s, dir, "summary_ea")(
          MatchPlanId.reconcile(
            Testdata.cleanRelius(s, dir), Testdata.cleanMatrix(s, dir)))
        BuildCorrectionFile.buildCorrectionDataFrame(ea).select(
          col("Transaction Id").as("transaction_id"),
          date_format(col("Transaction Date"), "yyyy-MM-dd").as("transaction_date"),
          col("Participant SSN").as("participant_ssn"),
          col("Participant Name").as("participant_name"),
          col("Matrix Account").as("matrix_account"),
          col("Current Tax Code 1").as("current_tax_code_1"),
          col("Current Tax Code 2").as("current_tax_code_2"),
          col("New Tax Code").as("new_tax_code"),
          col("New Taxable Amount").as("new_taxable_amount"),
          col("New First Year contrib").as("new_first_year_contrib"),
          col("Reason").as("reason"),
          col("Action").as("action"))
      },
      Some(OracleSql.query(
        """SELECT transaction_id,
          |  strftime(txn_date, '%Y-%m-%d') AS transaction_date,
          |  ssn AS participant_ssn, participant_name, matrix_account,
          |  tax_code_1 AS current_tax_code_1, tax_code_2 AS current_tax_code_2,
          |  new_tax_code, CAST(NULL AS DOUBLE) AS new_taxable_amount,
          |  CAST(NULL AS BIGINT) AS new_first_year_contrib,
          |  correction_reason AS reason, action
          |FROM ea
          |WHERE match_status IN ('match_needs_correction','match_needs_review')
          |  AND (suggested_tax_code_1 IS NOT NULL
          |    OR suggested_tax_code_2 IS NOT NULL
          |    OR list_contains(list_filter(list_transform(
          |      string_split(coalesce(action, ''), chr(10)),
          |      x -> upper(trim(x))), x -> x <> ''), 'INVESTIGATE'))
          |  AND _merge = 'both' AND date_within_tolerance
          |  AND list_has_any(list_filter(list_transform(
          |    string_split(coalesce(action, ''), chr(10)),
          |    x -> upper(trim(x))), x -> x <> ''),
          |    ['UPDATE_1099','INVESTIGATE'])""".stripMargin, OracleSql.EngineA))),

    // Bucketed-storage leg: byte-identical semantics to ea_reconcile
    // (same oracle SQL) but over catalog tables bucketed + sorted on the
    // match key, so the full-outer SMJ plans with ZERO exchanges —
    // BucketingSpec's toy proof made observable on the real engine
    // pipeline, and the layout a 100 TB deployment materializes once to
    // de-shuffle every reconcile after it.
    QueryDef(
      "ea_reconcile_bucketed",
      (s, dir) => {
        val (r, m) = bucketedInputs(s, dir)
        MatchPlanId.reconcile(r, m)
          .select(
            col("plan_id"), col("ssn"), col("gross_amt"), col("_merge"),
            dstr("exported_date"), dstr("txn_date"), col("tax_year"),
            col("dist_code_1"), col("dist_category_relius"), col("full_name"),
            col("tax_code_1"), col("tax_code_2"), col("transaction_id"),
            col("matrix_account"), col("participant_name"), col("fed_taxable_amt"),
            col("date_lag_days"), col("date_within_tolerance"),
            col("expected_tax_code_1"), col("expected_tax_code_2"),
            col("code_matches_expected"), col("needs_correction"),
            col("suggested_tax_code_1"), col("suggested_tax_code_2"),
            col("correction_reason"), col("action"), col("match_status"),
            col("new_tax_code"))
      },
      Some(OracleSql.query(
        """SELECT plan_id, ssn, gross_amt, _merge,
          |  strftime(exported_date, '%Y-%m-%d') AS exported_date,
          |  strftime(txn_date, '%Y-%m-%d') AS txn_date,
          |  tax_year, dist_code_1, dist_category_relius, full_name,
          |  tax_code_1, tax_code_2, transaction_id, matrix_account,
          |  participant_name, fed_taxable_amt, date_lag_days,
          |  date_within_tolerance, expected_tax_code_1, expected_tax_code_2,
          |  code_matches_expected, needs_correction, suggested_tax_code_1,
          |  suggested_tax_code_2, correction_reason, action, match_status,
          |  new_tax_code
          |FROM ea""".stripMargin, OracleSql.EngineA))),

    // Scale-stress variant: the same reconciliation without the plan scope,
    // so the full-outer SMJ shuffles the complete cleaned inputs.
    QueryDef(
      "ea_reconcile_all",
      (s, dir) =>
        Registry.memo(s, dir, "summary_ea_all")(
          MatchPlanId.reconcile(Testdata.cleanRelius(s, dir),
            Testdata.cleanMatrix(s, dir), planIds = None))
          .select(
            col("plan_id"), col("ssn"), col("gross_amt"), col("_merge"),
            dstr("exported_date"), dstr("txn_date"),
            col("date_lag_days"), col("date_within_tolerance"),
            col("needs_correction"), col("suggested_tax_code_1"),
            col("suggested_tax_code_2"), col("correction_reason"),
            col("action"), col("match_status"), col("new_tax_code")),
      Some(OracleSql.query(
        """SELECT plan_id, ssn, gross_amt, _merge,
          |  strftime(exported_date, '%Y-%m-%d') AS exported_date,
          |  strftime(txn_date, '%Y-%m-%d') AS txn_date,
          |  date_lag_days, date_within_tolerance, needs_correction,
          |  suggested_tax_code_1, suggested_tax_code_2, correction_reason,
          |  action, match_status, new_tax_code
          |FROM ea""".stripMargin, OracleSql.EngineAAll))),

    // P5 — inclusive date-range + month-set filter (V8 config +
    // Validators.applyDateFilter), applied over the memoized cleaned
    // Matrix frame — the oracle filters matrix_clean post-clean too, so
    // both sides agree by construction and the cleaner pipeline's codegen
    // is paid once per session, not once per date-filter variant.
    // Post-clean filtering is RESULT-EQUIVALENT to the reference's
    // filter-before-dedup order here: txn_date is one of the dedup match
    // keys, so every duplicate group shares a txn_date and the filter
    // keeps or drops a group uniformly regardless of ordering
    // (CleaningQaSpec pins the equivalence on planted duplicates). The
    // in-pipeline order itself is exercised by DateFilterEnginesSpec.
    QueryDef(
      "p5_date_filter",
      (s, dir) => {
        import graft.core.{Config, Validators => V}
        val cfg = Config.DateFilterConfig(
          Some(java.time.LocalDate.of(2024, 9, 1)),
          Some(java.time.LocalDate.of(2025, 3, 31)),
          Some(Set(1, 2, 9, 10, 11)))
        V.applyDateFilter(Testdata.cleanMatrix(s, dir), "txn_date", cfg)
          .select(col("plan_id"), col("ssn"), col("gross_amt"),
            dstr("txn_date"), col("tax_code_1"))
      },
      Some(OracleSql.query(
        """SELECT plan_id, ssn, gross_amt,
          |  strftime(txn_date, '%Y-%m-%d') AS txn_date, tax_code_1
          |FROM matrix_clean
          |WHERE txn_date >= DATE '2024-09-01' AND txn_date <= DATE '2025-03-31'
          |  AND month(txn_date) IN (1, 2, 9, 10, 11)""".stripMargin))),

    QueryDef(
      "eb_age_taxcode",
      (s, dir) =>
        Registry.memo(s, dir, "summary_eb")(
          AgeTaxCode.run(Testdata.cleanMatrix(s, dir), Testdata.cleanDemo(s, dir)))
          .select(
            col("plan_id"), col("ssn"), col("transaction_id"),
            col("matrix_account"), dstr("txn_date"), col("tax_code_1"),
            col("tax_code_2"), dstr("dob"), dstr("term_date"), col("full_name"),
            col("participant_name"), col("dob_year"), col("txn_year"),
            col("term_year"), col("age_at_distribution_year"),
            col("age_at_termination_year"), col("attained_59_5_in_txn_year"),
            col("attained_55_in_txn_year"), col("attained_55_in_term_year"),
            col("age_engine_excluded"), col("expected_tax_code_1"),
            col("expected_tax_code_2"), col("code_matches_expected"),
            col("match_status"), col("action"), col("correction_reason"),
            col("suggested_tax_code_1"), col("suggested_tax_code_2"),
            col("new_tax_code")),
      Some(OracleSql.query(
        """SELECT plan_id, ssn, transaction_id, matrix_account,
          |  strftime(txn_date, '%Y-%m-%d') AS txn_date, tax_code_1, tax_code_2,
          |  strftime(dob, '%Y-%m-%d') AS dob,
          |  strftime(term_date, '%Y-%m-%d') AS term_date,
          |  full_name, participant_name, dob_year, txn_year, term_year,
          |  age_at_distribution_year, age_at_termination_year,
          |  attained_59_5_in_txn_year, attained_55_in_txn_year,
          |  attained_55_in_term_year, age_engine_excluded, expected_tax_code_1,
          |  CAST(NULL AS VARCHAR) AS expected_tax_code_2, code_matches_expected,
          |  match_status, action, correction_reason, suggested_tax_code_1,
          |  suggested_tax_code_2, new_tax_code
          |FROM eb""".stripMargin, OracleSql.EngineB))),

    QueryDef(
      "ec_roth_taxable",
      (s, dir) =>
        Registry.memo(s, dir, "summary_ec")(
          RothTaxable.run(Testdata.cleanMatrix(s, dir), Testdata.cleanDemo(s, dir),
            Testdata.cleanBasis(s, dir)))
          .withColumn("txn_date", date_format(col("txn_date"), "yyyy-MM-dd")),
      Some(OracleSql.query(
        """SELECT transaction_id, strftime(txn_date, '%Y-%m-%d') AS txn_date,
          |  ssn, participant_name, matrix_account, plan_id, tax_code_1,
          |  tax_code_2, suggested_tax_code_1, suggested_tax_code_2,
          |  CASE WHEN nullif(upper(trim(suggested_tax_code_1)), '') IS NOT NULL
          |    THEN nullif(upper(trim(suggested_tax_code_1)), '')
          |      || coalesce(nullif(upper(trim(suggested_tax_code_2)), ''), '')
          |    END AS new_tax_code,
          |  fed_d AS fed_taxable_amt, gross_amt,
          |  roth_init_d AS roth_initial_contribution_year,
          |  first_roth_d AS first_roth_tax_year, start_roth_year,
          |  roth_basis_amt, age_at_txn, suggested_taxable_amt,
          |  suggested_first_roth_tax_year, correction_reason, action,
          |  match_status
          |FROM ec""".stripMargin, OracleSql.EngineC))),

    // O1 over Engines B/C/D: the same correction-file builder handles the
    // engine-specific optional suggestion columns.
    QueryDef(
      "eb_correction_file",
      (s, dir) => {
        val eb = Registry.memo(s, dir, "summary_eb")(
          AgeTaxCode.run(Testdata.cleanMatrix(s, dir), Testdata.cleanDemo(s, dir)))
        BuildCorrectionFile.buildCorrectionDataFrame(eb).select(
          col("Transaction Id").as("transaction_id"),
          date_format(col("Transaction Date"), "yyyy-MM-dd").as("transaction_date"),
          col("Participant SSN").as("participant_ssn"),
          col("Matrix Account").as("matrix_account"),
          col("Current Tax Code 1").as("current_tax_code_1"),
          col("New Tax Code").as("new_tax_code"),
          col("Reason").as("reason"),
          col("Action").as("action"))
      },
      Some(OracleSql.query(
        """SELECT transaction_id,
          |  strftime(txn_date, '%Y-%m-%d') AS transaction_date,
          |  ssn AS participant_ssn, matrix_account,
          |  tax_code_1 AS current_tax_code_1, new_tax_code,
          |  correction_reason AS reason, action
          |FROM eb
          |WHERE match_status IN ('match_needs_correction','match_needs_review')
          |  AND (suggested_tax_code_1 IS NOT NULL
          |    OR suggested_tax_code_2 IS NOT NULL
          |    OR list_contains(list_filter(list_transform(
          |      string_split(coalesce(action, ''), chr(10)),
          |      x -> upper(trim(x))), x -> x <> ''), 'INVESTIGATE'))
          |  AND list_has_any(list_filter(list_transform(
          |    string_split(coalesce(action, ''), chr(10)),
          |    x -> upper(trim(x))), x -> x <> ''),
          |    ['UPDATE_1099','INVESTIGATE'])""".stripMargin, OracleSql.EngineB))),

    QueryDef(
      "ec_correction_file",
      (s, dir) => {
        val corrections = Registry.memo(s, dir, "ec_corrections")(
          BuildCorrectionFile.buildCorrectionDataFrame(
            Registry.memo(s, dir, "summary_ec")(
              RothTaxable.run(Testdata.cleanMatrix(s, dir),
                Testdata.cleanDemo(s, dir), Testdata.cleanBasis(s, dir)))))
        corrections.select(
          col("Transaction Id").as("transaction_id"),
          date_format(col("Transaction Date"), "yyyy-MM-dd").as("transaction_date"),
          col("Participant SSN").as("participant_ssn"),
          col("Matrix Account").as("matrix_account"),
          col("Current Tax Code 1").as("current_tax_code_1"),
          col("Current Tax Code 2").as("current_tax_code_2"),
          col("New Tax Code").as("new_tax_code"),
          col("New Taxable Amount").as("new_taxable_amount"),
          col("New First Year contrib").as("new_first_year_contrib"),
          col("Reason").as("reason"),
          col("Action").as("action"))
      },
      Some(OracleSql.query(
        """SELECT transaction_id,
          |  strftime(txn_date, '%Y-%m-%d') AS transaction_date,
          |  ssn AS participant_ssn, matrix_account,
          |  tax_code_1 AS current_tax_code_1, tax_code_2 AS current_tax_code_2,
          |  CASE WHEN nullif(upper(trim(suggested_tax_code_1)), '') IS NOT NULL
          |    THEN nullif(upper(trim(suggested_tax_code_1)), '')
          |      || coalesce(nullif(upper(trim(suggested_tax_code_2)), ''), '')
          |    END AS new_tax_code,
          |  suggested_taxable_amt AS new_taxable_amount,
          |  suggested_first_roth_tax_year AS new_first_year_contrib,
          |  correction_reason AS reason, action
          |FROM ec
          |WHERE match_status IN ('match_needs_correction','match_needs_review')
          |  AND (suggested_tax_code_1 IS NOT NULL
          |    OR suggested_tax_code_2 IS NOT NULL
          |    OR suggested_taxable_amt IS NOT NULL
          |    OR suggested_first_roth_tax_year IS NOT NULL
          |    OR list_contains(list_filter(list_transform(
          |      string_split(coalesce(action, ''), chr(10)),
          |      x -> upper(trim(x))), x -> x <> ''), 'INVESTIGATE'))
          |  AND list_has_any(list_filter(list_transform(
          |    string_split(coalesce(action, ''), chr(10)),
          |    x -> upper(trim(x))), x -> x <> ''),
          |    ['UPDATE_1099','INVESTIGATE'])""".stripMargin, OracleSql.EngineC))),

    // O2 — tab split over Engine C's corrections: dual-action rows land in
    // BOTH outputs with the action literal overwritten.
    QueryDef(
      "ec_split_correction",
      (s, dir) => {
        val tabs = BuildCorrectionFile.splitCorrectionsByAction(
          Registry.memo(s, dir, "ec_corrections")(
            BuildCorrectionFile.buildCorrectionDataFrame(
              Registry.memo(s, dir, "summary_ec")(
                RothTaxable.run(Testdata.cleanMatrix(s, dir),
                  Testdata.cleanDemo(s, dir), Testdata.cleanBasis(s, dir))))))
        tabs("Correction").select(
          col("Transaction Id").as("transaction_id"),
          col("Participant SSN").as("participant_ssn"),
          col("New Tax Code").as("new_tax_code"),
          col("New Taxable Amount").as("new_taxable_amount"),
          col("Action").as("action"))
      },
      Some(OracleSql.query(
        """SELECT transaction_id, ssn AS participant_ssn,
          |  CASE WHEN nullif(upper(trim(suggested_tax_code_1)), '') IS NOT NULL
          |    THEN nullif(upper(trim(suggested_tax_code_1)), '')
          |      || coalesce(nullif(upper(trim(suggested_tax_code_2)), ''), '')
          |    END AS new_tax_code,
          |  suggested_taxable_amt AS new_taxable_amount,
          |  'UPDATE_1099' AS action
          |FROM ec
          |WHERE match_status IN ('match_needs_correction','match_needs_review')
          |  AND (suggested_tax_code_1 IS NOT NULL
          |    OR suggested_tax_code_2 IS NOT NULL
          |    OR suggested_taxable_amt IS NOT NULL
          |    OR suggested_first_roth_tax_year IS NOT NULL
          |    OR list_contains(list_filter(list_transform(
          |      string_split(coalesce(action, ''), chr(10)),
          |      x -> upper(trim(x))), x -> x <> ''), 'INVESTIGATE'))
          |  AND list_contains(list_filter(list_transform(
          |    string_split(coalesce(action, ''), chr(10)),
          |    x -> upper(trim(x))), x -> x <> ''), 'UPDATE_1099')""".stripMargin,
        OracleSql.EngineC))),

    QueryDef(
      "ec_split_investigate",
      (s, dir) => {
        val tabs = BuildCorrectionFile.splitCorrectionsByAction(
          Registry.memo(s, dir, "ec_corrections")(
            BuildCorrectionFile.buildCorrectionDataFrame(
              Registry.memo(s, dir, "summary_ec")(
                RothTaxable.run(Testdata.cleanMatrix(s, dir),
                  Testdata.cleanDemo(s, dir), Testdata.cleanBasis(s, dir))))))
        tabs("Investigate").select(
          col("Transaction Id").as("transaction_id"),
          col("Participant SSN").as("participant_ssn"),
          col("Reason").as("reason"),
          col("Action").as("action"))
      },
      Some(OracleSql.query(
        """SELECT transaction_id, ssn AS participant_ssn,
          |  correction_reason AS reason, 'INVESTIGATE' AS action
          |FROM ec
          |WHERE match_status IN ('match_needs_correction','match_needs_review')
          |  AND (suggested_tax_code_1 IS NOT NULL
          |    OR suggested_tax_code_2 IS NOT NULL
          |    OR suggested_taxable_amt IS NOT NULL
          |    OR suggested_first_roth_tax_year IS NOT NULL
          |    OR list_contains(list_filter(list_transform(
          |      string_split(coalesce(action, ''), chr(10)),
          |      x -> upper(trim(x))), x -> x <> ''), 'INVESTIGATE'))
          |  AND list_contains(list_filter(list_transform(
          |    string_split(coalesce(action, ''), chr(10)),
          |    x -> upper(trim(x))), x -> x <> ''), 'INVESTIGATE')""".stripMargin,
        OracleSql.EngineC))),

    QueryDef(
      "ed_correction_file",
      (s, dir) => {
        val ed = Registry.memo(s, dir, "summary_ed")(
          IraRollover.run(Testdata.cleanMatrix(s, dir)))
        BuildCorrectionFile.buildCorrectionDataFrame(ed).select(
          col("Transaction Id").as("transaction_id"),
          date_format(col("Transaction Date"), "yyyy-MM-dd").as("transaction_date"),
          col("Participant SSN").as("participant_ssn"),
          col("Matrix Account").as("matrix_account"),
          col("New Tax Code").as("new_tax_code"),
          col("Reason").as("reason"),
          col("Action").as("action"))
      },
      Some(OracleSql.query(
        """SELECT transaction_id,
          |  strftime(txn_date, '%Y-%m-%d') AS transaction_date,
          |  ssn AS participant_ssn, matrix_account, new_tax_code,
          |  correction_reason AS reason, action
          |FROM ed
          |WHERE match_status IN ('match_needs_correction','match_needs_review')
          |  AND (suggested_tax_code_1 IS NOT NULL
          |    OR list_contains(list_filter(list_transform(
          |      string_split(coalesce(action, ''), chr(10)),
          |      x -> upper(trim(x))), x -> x <> ''), 'INVESTIGATE'))
          |  AND list_has_any(list_filter(list_transform(
          |    string_split(coalesce(action, ''), chr(10)),
          |    x -> upper(trim(x))), x -> x <> ''),
          |    ['UPDATE_1099','INVESTIGATE'])""".stripMargin, OracleSql.EngineD))),

    QueryDef(
      "ed_ira_rollover",
      (s, dir) =>
        IraRollover.run(Testdata.cleanMatrix(s, dir)).select(
          col("transaction_id"), dstr("txn_date"), col("ssn"),
          col("participant_name"), col("matrix_account"), col("plan_id"),
          col("txn_method"), col("federal_taxing_method"), col("tax_form"),
          col("tax_code_1"), col("tax_code_2"), col("match_status"),
          col("action"), col("suggested_tax_code_1"),
          col("suggested_tax_code_2"), col("new_tax_code"),
          col("correction_reason")),
      Some(OracleSql.query(
        """SELECT transaction_id, strftime(txn_date, '%Y-%m-%d') AS txn_date,
          |  ssn, participant_name, matrix_account, plan_id, txn_method,
          |  federal_taxing_method, tax_form, tax_code_1, tax_code_2,
          |  match_status, action, suggested_tax_code_1,
          |  CAST(NULL AS VARCHAR) AS suggested_tax_code_2, new_tax_code,
          |  correction_reason
          |FROM ed""".stripMargin, OracleSql.EngineD))),
  )
}
