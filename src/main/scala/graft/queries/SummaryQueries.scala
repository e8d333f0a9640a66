package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Config, Normalizers => N}
import graft.engines.{AgeTaxCode, MatchPlanId, RothTaxable}

/** Summary/visualization builders A2–A12 (SURVEY §2.4) over the engine
  * outputs — the DataFrame-returning halves of the reference's
  * visualization modules, each with a DuckDB oracle.
  */
object SummaryQueries {

  private def ea(s: SparkSession, dir: String): DataFrame =
    Registry.memo(s, dir, "summary_ea")(
      MatchPlanId.reconcile(Testdata.cleanRelius(s, dir), Testdata.cleanMatrix(s, dir)))

  private def eb(s: SparkSession, dir: String): DataFrame =
    Registry.memo(s, dir, "summary_eb")(
      AgeTaxCode.run(Testdata.cleanMatrix(s, dir), Testdata.cleanDemo(s, dir)))

  private def ec(s: SparkSession, dir: String): DataFrame =
    Registry.memo(s, dir, "summary_ec")(
      RothTaxable.run(Testdata.cleanMatrix(s, dir), Testdata.cleanDemo(s, dir),
        Testdata.cleanBasis(s, dir)))

  private val Statuses: Seq[String] = Seq(
    Config.MatchStatus.NoAction, Config.MatchStatus.NeedsCorrection,
    Config.MatchStatus.NeedsReview, Config.MatchStatus.DateOutOfRange,
    Config.MatchStatus.UnmatchedRelius, Config.MatchStatus.UnmatchedMatrix,
    Config.MatchStatus.ExcludedAgeEngine, Config.MatchStatus.InsufficientData)

  def defs: Seq[QueryDef] = Seq(
    // A2 — monthly totals + correction counts + rate (Engine B output).
    QueryDef(
      "a2_monthly_corrections",
      (s, dir) =>
        eb(s, dir)
          .groupBy(date_format(col("txn_date"), "yyyy-MM").as("txn_month"))
          .agg(count(lit(1)).as("total"),
            sum(when(col("match_status") === Config.MatchStatus.NeedsCorrection, 1L)
              .otherwise(0L)).as("corrections"))
          .withColumn("rate",
            col("corrections").cast("double") / col("total").cast("double")),
      Some(OracleSql.query(
        """SELECT txn_month, total, corrections,
          |  CAST(corrections AS DOUBLE) / CAST(total AS DOUBLE) AS rate
          |FROM (
          |  SELECT strftime(txn_date, '%Y-%m') AS txn_month, count(*) AS total,
          |    CAST(sum(CASE WHEN match_status = 'match_needs_correction'
          |      THEN 1 ELSE 0 END) AS BIGINT) AS corrections
          |  FROM eb GROUP BY 1)""".stripMargin, OracleSql.EngineB))),

    // A3 — status KPI summary preserving zero-count statuses (Engine A).
    QueryDef(
      "a3_status_kpi",
      (s, dir) => {
        import s.implicits._
        val counts = ea(s, dir).groupBy("match_status").agg(count(lit(1)).as("n0"))
        val total = ea(s, dir).agg(count(lit(1)).as("total"))
        Statuses.toDF("match_status")
          .join(counts, Seq("match_status"), "left")
          .withColumn("n", coalesce(col("n0"), lit(0L)))
          .crossJoin(broadcast(total))
          .withColumn("pct", col("n").cast("double") / col("total").cast("double"))
          .select("match_status", "n", "pct")
      },
      Some(OracleSql.query(
        """SELECT s.match_status, coalesce(c.n0, 0) AS n,
          |  CAST(coalesce(c.n0, 0) AS DOUBLE)
          |    / CAST((SELECT count(*) FROM ea) AS DOUBLE) AS pct
          |FROM (VALUES ('match_no_action'), ('match_needs_correction'),
          |  ('match_needs_review'), ('date_out_of_range'), ('unmatched_relius'),
          |  ('unmatched_matrix'),
          |  ('excluded_from_age_engine_rollover_or_inherited'),
          |  ('age_rule_insufficient_data')) s(match_status)
          |LEFT JOIN (SELECT match_status, count(*) AS n0 FROM ea GROUP BY 1) c
          |  ON s.match_status = c.match_status""".stripMargin, OracleSql.EngineA))),

    // A4 — unmatched Relius-vs-Matrix summary: fixed two-group frame with
    // counts and share of ALL reconciled rows (reference
    // src/visualization/match_planid_visualization.py:107-134).
    QueryDef(
      "a4_unmatched_summary",
      (s, dir) => {
        import s.implicits._
        val counts = ea(s, dir).groupBy("match_status").agg(count(lit(1)).as("n0"))
        val total = ea(s, dir).agg(count(lit(1)).as("total"))
        Seq(
          ("unmatched_relius", Config.MatchStatus.UnmatchedRelius),
          ("unmatched_matrix", Config.MatchStatus.UnmatchedMatrix))
          .toDF("unmatched_group", "match_status")
          .join(counts, Seq("match_status"), "left")
          .crossJoin(broadcast(total))
          .select(col("unmatched_group"),
            coalesce(col("n0"), lit(0L)).as("count"),
            (coalesce(col("n0"), lit(0L)).cast("double")
              / col("total").cast("double")).as("percent"))
      },
      Some(OracleSql.query(
        """SELECT g.unmatched_group, CAST(coalesce(c.n0, 0) AS BIGINT) AS count,
          |  CAST(coalesce(c.n0, 0) AS DOUBLE)
          |    / CAST((SELECT count(*) FROM ea) AS DOUBLE) AS percent
          |FROM (VALUES ('unmatched_relius', 'unmatched_relius'),
          |  ('unmatched_matrix', 'unmatched_matrix')) g(unmatched_group, status)
          |LEFT JOIN (SELECT match_status, count(*) AS n0 FROM ea GROUP BY 1) c
          |  ON g.status = c.match_status""".stripMargin, OracleSql.EngineA))),

    // A5 — value_counts of correction reasons with null -> 'Unknown'.
    QueryDef(
      "a5_reason_counts",
      (s, dir) =>
        ea(s, dir)
          .groupBy(coalesce(col("correction_reason"), lit("Unknown")).as("reason"))
          .agg(count(lit(1)).as("n")),
      Some(OracleSql.query(
        """SELECT coalesce(correction_reason, 'Unknown') AS reason, count(*) AS n
          |FROM ea GROUP BY 1""".stripMargin, OracleSql.EngineA))),

    // A6 — date-lag histogram over matched rows.
    QueryDef(
      "a6_lag_histogram",
      (s, dir) =>
        ea(s, dir)
          .filter(col("_merge") === "both")
          .groupBy("date_lag_days")
          .agg(count(lit(1)).as("n")),
      Some(OracleSql.query(
        """SELECT date_lag_days, count(*) AS n FROM ea
          |WHERE _merge = 'both' GROUP BY 1""".stripMargin, OracleSql.EngineA))),

    // A7 — month x reason trend.
    QueryDef(
      "a7_month_reason",
      (s, dir) =>
        ea(s, dir)
          .filter(col("_merge") === "both")
          .groupBy(date_format(col("txn_date"), "yyyy-MM").as("txn_month"),
            coalesce(col("correction_reason"), lit("Unknown")).as("reason"))
          .agg(count(lit(1)).as("n")),
      Some(OracleSql.query(
        """SELECT strftime(txn_date, '%Y-%m') AS txn_month,
          |  coalesce(correction_reason, 'Unknown') AS reason, count(*) AS n
          |FROM ea WHERE _merge = 'both' GROUP BY 1, 2""".stripMargin,
        OracleSql.EngineA))),

    // A8 — crosstab current code x reason (long form, Engine B).
    QueryDef(
      "a8_code_reason_crosstab",
      (s, dir) =>
        eb(s, dir)
          .groupBy(coalesce(col("tax_code_1"), lit("NA")).as("tax_code_1"),
            coalesce(col("correction_reason"), lit("none")).as("reason"))
          .agg(count(lit(1)).as("n")),
      Some(OracleSql.query(
        """SELECT coalesce(tax_code_1, 'NA') AS tax_code_1,
          |  coalesce(correction_reason, 'none') AS reason, count(*) AS n
          |FROM eb GROUP BY 1, 2""".stripMargin, OracleSql.EngineB))),

    // A9 — month x status pivot with fixed vocabulary, zero-filled.
    QueryDef(
      "a9_status_pivot",
      (s, dir) =>
        ea(s, dir)
          .filter(col("txn_date").isNotNull)
          .groupBy(date_format(col("txn_date"), "yyyy-MM").as("txn_month"))
          .pivot("match_status", Statuses)
          .count()
          .na.fill(0L),
      Some(OracleSql.query(
        """SELECT strftime(txn_date, '%Y-%m') AS txn_month,
          |  count(CASE WHEN match_status = 'match_no_action' THEN 1 END)
          |    AS "match_no_action",
          |  count(CASE WHEN match_status = 'match_needs_correction' THEN 1 END)
          |    AS "match_needs_correction",
          |  count(CASE WHEN match_status = 'match_needs_review' THEN 1 END)
          |    AS "match_needs_review",
          |  count(CASE WHEN match_status = 'date_out_of_range' THEN 1 END)
          |    AS "date_out_of_range",
          |  count(CASE WHEN match_status = 'unmatched_relius' THEN 1 END)
          |    AS "unmatched_relius",
          |  count(CASE WHEN match_status = 'unmatched_matrix' THEN 1 END)
          |    AS "unmatched_matrix",
          |  count(CASE WHEN match_status =
          |    'excluded_from_age_engine_rollover_or_inherited' THEN 1 END)
          |    AS "excluded_from_age_engine_rollover_or_inherited",
          |  count(CASE WHEN match_status = 'age_rule_insufficient_data' THEN 1 END)
          |    AS "age_rule_insufficient_data"
          |FROM ea WHERE txn_date IS NOT NULL
          |GROUP BY 1""".stripMargin, OracleSql.EngineA))),

    // A10 — correction rate by term-date presence (Engine B).
    QueryDef(
      "a10_term_rate",
      (s, dir) =>
        eb(s, dir)
          .groupBy(when(col("term_date").isNotNull, "with_term_date")
            .otherwise("without_term_date").as("group_label"))
          .agg(count(lit(1)).as("total"),
            sum(when(col("match_status") === Config.MatchStatus.NeedsCorrection, 1L)
              .otherwise(0L)).as("corrections"))
          .withColumn("rate",
            col("corrections").cast("double") / col("total").cast("double")),
      Some(OracleSql.query(
        """SELECT group_label, total, corrections,
          |  CAST(corrections AS DOUBLE) / CAST(total AS DOUBLE) AS rate
          |FROM (
          |  SELECT CASE WHEN term_date IS NOT NULL THEN 'with_term_date'
          |    ELSE 'without_term_date' END AS group_label,
          |    count(*) AS total,
          |    CAST(sum(CASE WHEN match_status = 'match_needs_correction'
          |      THEN 1 ELSE 0 END) AS BIGINT) AS corrections
          |  FROM eb GROUP BY 1)""".stripMargin, OracleSql.EngineB))),

    // A11 — action-mix counts over Engine C's multi-line action cells.
    QueryDef(
      "a11_action_mix",
      (s, dir) => {
        val tokens = N.actionTokens(col("action"))
        ec(s, dir).agg(
          count(lit(1)).as("total"),
          sum(when(array_contains(tokens, "UPDATE_1099"), 1L).otherwise(0L))
            .as("n_update"),
          sum(when(array_contains(tokens, "INVESTIGATE"), 1L).otherwise(0L))
            .as("n_investigate"),
          sum(when(array_contains(tokens, "UPDATE_1099")
            && array_contains(tokens, "INVESTIGATE"), 1L).otherwise(0L))
            .as("n_both"))
      },
      Some(OracleSql.query(
        """SELECT count(*) AS total,
          |  CAST(sum(CASE WHEN list_contains(t, 'UPDATE_1099') THEN 1 ELSE 0 END)
          |    AS BIGINT) AS n_update,
          |  CAST(sum(CASE WHEN list_contains(t, 'INVESTIGATE') THEN 1 ELSE 0 END)
          |    AS BIGINT) AS n_investigate,
          |  CAST(sum(CASE WHEN list_contains(t, 'UPDATE_1099')
          |    AND list_contains(t, 'INVESTIGATE') THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_both
          |FROM (SELECT list_filter(list_transform(
          |    string_split(coalesce(action, ''), chr(10)),
          |    x -> upper(trim(x))), x -> x <> '') AS t FROM ec)""".stripMargin,
        OracleSql.EngineC))),

    // A12 — taxable-delta distribution (Engine C).
    QueryDef(
      "a12_taxable_delta",
      (s, dir) =>
        ec(s, dir)
          .filter(col("suggested_taxable_amt").isNotNull
            && col("fed_taxable_amt").isNotNull)
          .groupBy(round(col("suggested_taxable_amt") - col("fed_taxable_amt"), 2)
            .as("delta"))
          .agg(count(lit(1)).as("n")),
      Some(OracleSql.query(
        """SELECT round(suggested_taxable_amt - fed_d, 2) AS delta, count(*) AS n
          |FROM ec
          |WHERE suggested_taxable_amt IS NOT NULL AND fed_d IS NOT NULL
          |GROUP BY 1""".stripMargin, OracleSql.EngineC))),
  )
}
