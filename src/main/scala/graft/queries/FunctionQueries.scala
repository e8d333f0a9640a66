package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{Normalizers => N, Validators => V}

/** Per-operator micro-queries for the scalar expression library (SURVEY
  * §2.5 F1–F21) and validators (§2.6 V1–V6): messy inputs derived from
  * `orders` keys, one query per operator family, each with a DuckDB oracle
  * replaying the same algebra.
  */
object FunctionQueries {

  private val k = col("k")

  /** Edge-case input battery (twin: `inputs` CTE below). */
  private def inputs(s: SparkSession, dir: String): DataFrame =
    Registry.table(s, dir, "orders").select(
      col("o_orderkey").as("k"), col("o_custkey").as("c"))
      .withColumn("ssn_in",
        when(k % 7 === 0, "123-45-6789").when(k % 7 === 1, "45678901.0")
          .when(k % 7 === 2, " 123456789 ").when(k % 7 === 3, "999999999")
          .when(k % 7 === 4, "ABC").when(k % 7 === 5, lit(null).cast(StringType))
          .otherwise("1234567890123"))
      .withColumn("code_in",
        when(k % 6 === 0, "7 - Normal").when(k % 6 === 1, " 11 - Loan")
          .when(k % 6 === 2, "g").when(k % 6 === 3, "!bad")
          .when(k % 6 === 4, lit(null).cast(StringType)).otherwise("  B7 extra"))
      .withColumn("tid_in",
        when(k % 6 === 0, "44324568.0").when(k % 6 === 1, "12345")
          .when(k % 6 === 2, " 987 ").when(k % 6 === 3, "TX-99")
          .when(k % 6 === 4, "12-34").otherwise(lit(null).cast(StringType)))
      .withColumn("name1",
        when(k % 4 === 0, "  Ann ").when(k % 4 === 1, "Bob")
          .when(k % 4 === 2, lit(null).cast(StringType)).otherwise(""))
      .withColumn("name2",
        when(k % 3 === 0, " Lee ").when(k % 3 === 1, lit(null).cast(StringType))
          .otherwise(""))
      .withColumn("dist_in",
        when(k % 8 === 0, "Rollover to IRA").when(k % 8 === 1, "Partial Rollover")
          .when(k % 8 === 2, "partial liquidation").when(k % 8 === 3, "RMD")
          .when(k % 8 === 4, "Recurring payment").when(k % 8 === 5, "Full Liquidation")
          .when(k % 8 === 6, "Misc").otherwise(lit(null).cast(StringType)))
      .withColumn("txt_in",
        when(k % 5 === 0, "  Mixed  Case ").when(k % 5 === 1, "no tax")
          .when(k % 5 === 2, "1099-R").when(k % 5 === 3, lit(null).cast(StringType))
          .otherwise("A  B   C"))
      .withColumn("date_in",
        when(k % 6 === 0, "2024-02-29").when(k % 6 === 1, "not-a-date")
          .when(k % 6 === 2, "2051-12-31").when(k % 6 === 3, "1989-01-01")
          .when(k % 6 === 4, lit(null).cast(StringType)).otherwise("2025-06-15"))
      .withColumn("amt_in",
        when(k % 6 === 0, "123.45").when(k % 6 === 1, "-5")
          .when(k % 6 === 2, "abc").when(k % 6 === 3, lit(null).cast(StringType))
          .when(k % 6 === 4, "20000000").otherwise("0"))
      .withColumn("year_in",
        when(k % 5 === 0, 2016.0).when(k % 5 === 1, 2021.5)
          .when(k % 5 === 2, lit(null).cast(DoubleType)).when(k % 5 === 3, 1800.0)
          .otherwise(2024.0))
      .withColumn("year2_in",
        when(k % 2 === 0, 2018.0).otherwise(lit(null).cast(DoubleType)))
      .withColumn("dob_in",
        date_add(to_date(lit("1945-01-01")), ((col("c") * 13) % 18263).cast(IntegerType)))
      .withColumn("yr_in", (lit(2024L) + k % 2).cast(LongType))
      .withColumn("action_in",
        when(k % 4 === 0, "UPDATE_1099\nINVESTIGATE")
          .when(k % 4 === 1, " update_1099 ")
          .when(k % 4 === 2, "").otherwise(lit(null).cast(StringType)))
      .withColumn("s1_in",
        when(k % 4 === 0, "4").when(k % 4 === 1, " g").when(k % 4 === 2, "")
          .otherwise(lit(null).cast(StringType)))
      .withColumn("s2_in",
        when(k % 3 === 0, "G").when(k % 3 === 1, "")
          .otherwise(lit(null).cast(StringType)))

  /** The SQL twin of [[inputs]], prepended to every oracle. */
  private val InputsCte: String = """
inputs AS (
  SELECT o_orderkey AS k, o_custkey AS c,
    CASE CAST(o_orderkey % 7 AS INTEGER) WHEN 0 THEN '123-45-6789'
      WHEN 1 THEN '45678901.0' WHEN 2 THEN ' 123456789 ' WHEN 3 THEN '999999999'
      WHEN 4 THEN 'ABC' WHEN 5 THEN NULL ELSE '1234567890123' END AS ssn_in,
    CASE CAST(o_orderkey % 6 AS INTEGER) WHEN 0 THEN '7 - Normal'
      WHEN 1 THEN ' 11 - Loan' WHEN 2 THEN 'g' WHEN 3 THEN '!bad'
      WHEN 4 THEN NULL ELSE '  B7 extra' END AS code_in,
    CASE CAST(o_orderkey % 6 AS INTEGER) WHEN 0 THEN '44324568.0'
      WHEN 1 THEN '12345' WHEN 2 THEN ' 987 ' WHEN 3 THEN 'TX-99'
      WHEN 4 THEN '12-34' ELSE NULL END AS tid_in,
    CASE CAST(o_orderkey % 4 AS INTEGER) WHEN 0 THEN '  Ann ' WHEN 1 THEN 'Bob'
      WHEN 2 THEN NULL ELSE '' END AS name1,
    CASE CAST(o_orderkey % 3 AS INTEGER) WHEN 0 THEN ' Lee ' WHEN 1 THEN NULL
      ELSE '' END AS name2,
    CASE CAST(o_orderkey % 8 AS INTEGER) WHEN 0 THEN 'Rollover to IRA'
      WHEN 1 THEN 'Partial Rollover' WHEN 2 THEN 'partial liquidation'
      WHEN 3 THEN 'RMD' WHEN 4 THEN 'Recurring payment'
      WHEN 5 THEN 'Full Liquidation' WHEN 6 THEN 'Misc' ELSE NULL END AS dist_in,
    CASE CAST(o_orderkey % 5 AS INTEGER) WHEN 0 THEN '  Mixed  Case '
      WHEN 1 THEN 'no tax' WHEN 2 THEN '1099-R' WHEN 3 THEN NULL
      ELSE 'A  B   C' END AS txt_in,
    CASE CAST(o_orderkey % 6 AS INTEGER) WHEN 0 THEN '2024-02-29'
      WHEN 1 THEN 'not-a-date' WHEN 2 THEN '2051-12-31' WHEN 3 THEN '1989-01-01'
      WHEN 4 THEN NULL ELSE '2025-06-15' END AS date_in,
    CASE CAST(o_orderkey % 6 AS INTEGER) WHEN 0 THEN '123.45' WHEN 1 THEN '-5'
      WHEN 2 THEN 'abc' WHEN 3 THEN NULL WHEN 4 THEN '20000000'
      ELSE '0' END AS amt_in,
    CASE CAST(o_orderkey % 5 AS INTEGER) WHEN 0 THEN 2016.0 WHEN 1 THEN 2021.5
      WHEN 2 THEN NULL WHEN 3 THEN 1800.0 ELSE 2024.0 END AS year_in,
    CASE WHEN o_orderkey % 2 = 0 THEN 2018.0 ELSE NULL END AS year2_in,
    DATE '1945-01-01' + CAST((o_custkey*13) % 18263 AS INTEGER) AS dob_in,
    CAST(2024 + o_orderkey % 2 AS BIGINT) AS yr_in,
    CASE CAST(o_orderkey % 4 AS INTEGER)
      WHEN 0 THEN 'UPDATE_1099' || chr(10) || 'INVESTIGATE'
      WHEN 1 THEN ' update_1099 ' WHEN 2 THEN '' ELSE NULL END AS action_in,
    CASE CAST(o_orderkey % 4 AS INTEGER) WHEN 0 THEN '4' WHEN 1 THEN ' g'
      WHEN 2 THEN '' ELSE NULL END AS s1_in,
    CASE CAST(o_orderkey % 3 AS INTEGER) WHEN 0 THEN 'G' WHEN 1 THEN ''
      ELSE NULL END AS s2_in
  FROM orders)"""

  private def q(name: String, cols: DataFrame => Seq[Column], sql: String): QueryDef =
    QueryDef(name, (s, dir) => { val in = inputs(s, dir); in.select(cols(in): _*) },
      Some(s"WITH $InputsCte\n$sql"))

  /** The DuckDB twin of the cleaned-SSN algebra, over column `col`. */
  private def ssnSql(c: String): String =
    s"""CASE WHEN regexp_replace(regexp_replace(trim($c), '^(\\d+)\\.0$$', '\\1'),
       |  '[^0-9]', '', 'g') = ''
       |  OR length(regexp_replace(regexp_replace(trim($c), '^(\\d+)\\.0$$', '\\1'),
       |    '[^0-9]', '', 'g')) > 9 THEN NULL
       |ELSE lpad(regexp_replace(regexp_replace(trim($c), '^(\\d+)\\.0$$', '\\1'),
       |  '[^0-9]', '', 'g'), 9, '0') END""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    q("f01_normalize_ssn",
      _ => Seq(k, col("ssn_in"), N.normalizeSsn(col("ssn_in")).as("ssn_norm")),
      s"SELECT k, ssn_in, ${ssnSql("ssn_in")} AS ssn_norm FROM inputs"),

    q("f03_f04_to_date_year",
      _ => Seq(k, date_format(N.toDate(col("date_in")), "yyyy-MM-dd").as("d"),
        N.yearFromDate(col("date_in")).as("yr")),
      """SELECT k, strftime(try_cast(date_in AS DATE), '%Y-%m-%d') AS d,
        |  CAST(year(try_cast(date_in AS DATE)) AS BIGINT) AS yr
        |FROM inputs""".stripMargin),

    q("f05_attained_age",
      _ => Seq(k,
        N.attainedAgeByYearEnd(col("dob_in"), col("yr_in"), 59, 6).as("att_59_5"),
        N.attainedAgeByYearEnd(col("dob_in"), col("yr_in"), 55).as("att_55")),
      """SELECT k,
        |  coalesce(CAST(dob_in + INTERVAL 59 YEAR + INTERVAL 6 MONTH AS DATE)
        |    <= make_date(CAST(yr_in AS INTEGER), 12, 31), FALSE) AS att_59_5,
        |  coalesce(CAST(dob_in + INTERVAL 55 YEAR AS DATE)
        |    <= make_date(CAST(yr_in AS INTEGER), 12, 31), FALSE) AS att_55
        |FROM inputs""".stripMargin),

    q("f06_f07_numeric",
      _ => Seq(k, N.toNumeric(col("amt_in")).as("amt_d"),
        N.toInt64(col("amt_in")).as("amt_l")),
      """SELECT k, try_cast(amt_in AS DOUBLE) AS amt_d,
        |  CAST(TRUNC(try_cast(amt_in AS DOUBLE)) AS BIGINT) AS amt_l
        |FROM inputs""".stripMargin),

    q("f08_f12_text_norms",
      _ => Seq(k,
        N.normalizeText(col("txt_in")).as("txt_trim"),
        N.normalizeState(col("txt_in")).as("state_norm"),
        N.normalizeCompactUpper(col("txt_in")).as("compact"),
        N.normalizeSpaceLower(col("txt_in")).as("space_lower")),
      """SELECT k, trim(txt_in) AS txt_trim,
        |  upper(trim(txt_in)) AS state_norm,
        |  replace(regexp_replace(upper(trim(txt_in)), '\s+', '', 'g'), '-', '')
        |    AS compact,
        |  lower(regexp_replace(trim(txt_in), '\s+', ' ', 'g')) AS space_lower
        |FROM inputs""".stripMargin),

    q("f10_normalize_tax_code",
      _ => Seq(k, N.normalizeTaxCode(col("code_in")).as("code_norm")),
      """SELECT k, upper(nullif(regexp_extract(code_in,
        |  '^\s*([A-Za-z0-9]{1,2})', 1), '')) AS code_norm
        |FROM inputs""".stripMargin),

    q("f13_transaction_id",
      _ => Seq(k, N.normalizeTransactionId(col("tid_in")).as("tid_norm")),
      """SELECT k,
        |  CASE WHEN trim(tid_in) IS NULL OR trim(tid_in) = '' THEN NULL
        |    WHEN regexp_extract(trim(tid_in), '^(\d+)\.0+$', 1) <> ''
        |      THEN regexp_extract(trim(tid_in), '^(\d+)\.0+$', 1)
        |    WHEN regexp_matches(trim(tid_in), '^\d+$') THEN trim(tid_in)
        |    WHEN regexp_matches(trim(tid_in), '[A-Za-z]') THEN NULL
        |    WHEN regexp_replace(trim(tid_in), '[^0-9]', '', 'g') = '' THEN NULL
        |    ELSE regexp_replace(trim(tid_in), '[^0-9]', '', 'g') END AS tid_norm
        |FROM inputs""".stripMargin),

    q("f14_dist_category",
      _ => Seq(k, N.classifyReliusDistType(col("dist_in")).as("category")),
      """SELECT k,
        |  CASE WHEN lower(trim(dist_in)) IS NULL THEN 'other'
        |    WHEN contains(lower(trim(dist_in)), 'rollover')
        |      AND contains(lower(trim(dist_in)), 'partial') THEN 'partial_rollover'
        |    WHEN contains(lower(trim(dist_in)), 'rollover') THEN 'rollover'
        |    WHEN contains(lower(trim(dist_in)), 'rmd') THEN 'rmd'
        |    WHEN contains(lower(trim(dist_in)), 'partial')
        |      OR contains(lower(trim(dist_in)), 'recurring') THEN 'partial_cash'
        |    WHEN contains(lower(trim(dist_in)), 'liquidation')
        |      AND contains(lower(trim(dist_in)), 'full') THEN 'final_cash'
        |    ELSE 'other' END AS category
        |FROM inputs""".stripMargin),

    q("f15_full_name",
      _ => Seq(k, N.fullName(col("name1"), col("name2")).as("full_name")),
      """SELECT k, nullif(trim(coalesce(trim(name1), '') || ' '
        |  || coalesce(trim(name2), '')), '') AS full_name
        |FROM inputs""".stripMargin),

    q("f16_f17_age_start_year",
      _ => Seq(k,
        N.computeAgeYears(col("dob_in"), N.toDate(col("date_in"))).as("age_years"),
        N.computeStartYear(col("year_in"), col("year2_in")).as("start_year")),
      """SELECT k,
        |  CAST(year(try_cast(date_in AS DATE)) - year(dob_in) AS DOUBLE)
        |    AS age_years,
        |  coalesce(
        |    CASE WHEN round(year_in) = year_in
        |      THEN CAST(TRUNC(year_in) AS BIGINT) END,
        |    CASE WHEN round(year2_in) = year2_in
        |      THEN CAST(TRUNC(year2_in) AS BIGINT) END) AS start_year
        |FROM inputs""".stripMargin),

    q("f18_combined_tax_code",
      _ => Seq(k, N.combinedTaxCode(col("s1_in"), col("s2_in")).as("new_tax_code")),
      """SELECT k,
        |  CASE WHEN nullif(upper(trim(s1_in)), '') IS NOT NULL
        |    THEN nullif(upper(trim(s1_in)), '')
        |      || coalesce(nullif(upper(trim(s2_in)), ''), '') END AS new_tax_code
        |FROM inputs""".stripMargin),

    q("f19_f21_action_arrays",
      _ => {
        val tokens = N.actionTokens(col("action_in"))
        Seq(k,
          concat_ws("|", tokens).as("tokens"),
          concat_ws("|", N.appendWhere(tokens, k % 2 === 0, "EXTRA")).as("appended"),
          N.joinReasons(tokens).as("reasons"),
          N.joinActions(tokens).as("actions"))
      },
      """SELECT k,
        |  coalesce(array_to_string(t, '|'), '') AS tokens,
        |  coalesce(array_to_string(
        |    CASE WHEN k % 2 = 0 AND NOT list_contains(t, 'EXTRA')
        |      THEN list_append(t, 'EXTRA') ELSE t END, '|'), '') AS appended,
        |  CASE WHEN len(t) > 0 THEN array_to_string(
        |    list_transform(t, x -> '- ' || x), chr(10)) END AS reasons,
        |  CASE WHEN len(t) > 0 THEN array_to_string(t, chr(10)) END AS actions
        |FROM (SELECT k, list_filter(list_transform(
        |    string_split(coalesce(action_in, ''), chr(10)),
        |    x -> upper(trim(x))), x -> x <> '') AS t FROM inputs)""".stripMargin),

    q("v1_validate_ssn",
      _ => Seq(k, V.validateSsn(col("ssn_in")).as("ssn_valid")),
      """SELECT k, coalesce(regexp_matches(trim(ssn_in), '^[0-9]{9}$')
        |  AND trim(ssn_in) NOT IN
        |    ('000000000','999999999','012345678','123456789')
        |  AND substr(trim(ssn_in), 1, 3) NOT IN ('000','666')
        |  AND NOT starts_with(substr(trim(ssn_in), 1, 3), '9'), FALSE)
        |  AS ssn_valid
        |FROM inputs""".stripMargin),

    q("v2_validate_amounts",
      in => {
        val g = N.toNumeric(col("amt_in"))
        val t = when(k % 3 === 0, g).when(k % 3 === 1, g * 2)
          .otherwise(lit(null).cast(DoubleType))
        Seq(k, V.validateAmounts(g).as("gross_valid"),
          V.validateAmounts(g, Some(t)).as("gross_taxable_valid"))
      },
      """SELECT k,
        |  coalesce(g IS NOT NULL AND NOT (g < 0) AND abs(g) <= 10000000, FALSE)
        |    AS gross_valid,
        |  coalesce(g IS NOT NULL AND NOT (g < 0) AND abs(g) <= 10000000
        |    AND t IS NOT NULL AND t >= 0 AND t <= g, FALSE) AS gross_taxable_valid
        |FROM (SELECT k, try_cast(amt_in AS DOUBLE) AS g,
        |    CASE WHEN k % 3 = 0 THEN try_cast(amt_in AS DOUBLE)
        |         WHEN k % 3 = 1 THEN try_cast(amt_in AS DOUBLE) * 2
        |         ELSE NULL END AS t
        |  FROM inputs)""".stripMargin),

    q("v3_validate_dates",
      _ => Seq(k,
        V.validateDates(col("date_in"), today = Testdata.Today).as("valid_default"),
        V.validateDates(col("date_in"),
          Some(date_add(N.toDate(col("date_in")), 40)),
          today = Testdata.Today).as("valid_pay")),
      """SELECT k,
        |  coalesce(d IS NOT NULL AND year(d) BETWEEN 1990 AND 2050
        |    AND d <= DATE '2026-01-01', FALSE) AS valid_default,
        |  coalesce(d IS NOT NULL AND year(d) BETWEEN 1990 AND 2050
        |    AND d <= DATE '2026-01-01' AND (d + 40) IS NOT NULL
        |    AND (d + 40) <= DATE '2026-01-31' AND (d + 40) >= d - 30, FALSE)
        |    AS valid_pay
        |FROM (SELECT k, try_cast(date_in AS DATE) AS d FROM inputs)""".stripMargin),

    q("v4_validate_1099r_code",
      _ => Seq(k, V.validate1099rCode(col("code_in")).as("code_valid")),
      """SELECT k, coalesce(upper(trim(code_in)) IN
        |  ('1','2','4','7','8','B','G','H','L','P','Q'), FALSE) AS code_valid
        |FROM inputs""".stripMargin),

    q("v5_cross_validate",
      in => {
        val g = N.toNumeric(col("amt_in"))
        val t = when(k % 3 === 0, g).when(k % 3 === 1, g * 2)
          .otherwise(lit(null).cast(DoubleType))
        val age = (lit(40) + k % 40).cast(DoubleType)
        Seq(k, concat_ws("|",
          V.crossValidate(g, t, col("code_in"), Some(age))).as("cross_issues"))
      },
      """SELECT k, coalesce(array_to_string(list_filter([
        |    CASE WHEN g IS NOT NULL AND t IS NOT NULL
        |      AND upper(trim(code_in)) = 'G' AND t > g * 0.1
        |      THEN 'cross_code_g_taxable_over_10pct' END,
        |    CASE WHEN g IS NOT NULL AND t IS NOT NULL AND t > g * 1.5
        |      THEN 'cross_taxable_exceeds_gross_150pct' END,
        |    CASE WHEN upper(trim(code_in)) = '1' AND a IS NOT NULL AND a >= 59.5
        |      THEN 'cross_code1_age_over_59_5' END],
        |    x -> x IS NOT NULL), '|'), '') AS cross_issues
        |FROM (SELECT k, code_in, try_cast(amt_in AS DOUBLE) AS g,
        |    CASE WHEN k % 3 = 0 THEN try_cast(amt_in AS DOUBLE)
        |         WHEN k % 3 = 1 THEN try_cast(amt_in AS DOUBLE) * 2
        |         ELSE NULL END AS t,
        |    CAST(40 + k % 40 AS DOUBLE) AS a
        |  FROM inputs)""".stripMargin),

    q("v6_build_issues",
      _ => {
        val f1 = when(k % 3 === 0, true).when(k % 3 === 1, false)
          .otherwise(lit(null).cast(BooleanType))
        val f2 = when(k % 2 === 0, false).otherwise(lit(true))
        Seq(k, concat_ws("|",
          V.buildValidationIssues(f1, f2, f1, f2)).as("issues"))
      },
      """SELECT k, coalesce(array_to_string(list_filter([
        |    CASE WHEN f1 = FALSE THEN 'ssn_invalid' END,
        |    CASE WHEN f2 = FALSE THEN 'amount_invalid' END,
        |    CASE WHEN f1 = FALSE THEN 'date_invalid' END,
        |    CASE WHEN f2 = FALSE THEN 'code_1099r_invalid' END],
        |    x -> x IS NOT NULL), '|'), '') AS issues
        |FROM (SELECT k,
        |    CASE WHEN k % 3 = 0 THEN TRUE WHEN k % 3 = 1 THEN FALSE
        |      ELSE NULL END AS f1,
        |    CASE WHEN k % 2 = 0 THEN FALSE ELSE TRUE END AS f2
        |  FROM inputs)""".stripMargin),
  )
}
