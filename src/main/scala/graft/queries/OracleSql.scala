package graft.queries

/** DuckDB-dialect oracle SQL for the engine queries: derives the same raw
  * Relius/Matrix/demo/basis inputs as [[Testdata]] (integer/string
  * arithmetic over `orders`, bit-identical), replays the cleaner and engine
  * semantics in SQL, and projects the same columns as each Spark query.
  *
  * Conventions shared with the Spark side:
  *  - "today" is pinned to DATE '2026-01-01' (Testdata.Today);
  *  - date columns are emitted as 'yyyy-MM-dd' strings and array columns as
  *    '|'-joined strings so both engines produce identical scalar types;
  *  - all money values are integral-valued doubles so sums stay exact.
  */
object OracleSql {

  /** Adapter + cleaner CTE prelude (twin of Testdata.* and graft.cleaning.*).
    * Unreferenced CTEs cost nothing, so every oracle includes the full set.
    */
  val Prelude: String = """
base AS (
  SELECT o_orderkey AS k, o_custkey AS c,
    CAST(FLOOR(o_totalprice) AS BIGINT) AS g,
    DATE '2024-06-01' + CAST(o_orderkey % 400 AS INTEGER) AS exported_date,
    DATE '2024-06-01' + CAST(o_orderkey % 400 AS INTEGER)
      + CAST(o_orderkey % 15 AS INTEGER) AS txn_date,
    CASE CAST(o_orderkey % 10 AS INTEGER)
      WHEN 0 THEN '300004PLAT' WHEN 1 THEN '300004MBD' WHEN 2 THEN '300004MBDII'
      WHEN 3 THEN '300005A' WHEN 4 THEN '200777R' WHEN 5 THEN '300001IRA'
      WHEN 6 THEN '400200IRA' WHEN 7 THEN '200100' WHEN 8 THEN '200200'
      ELSE '200300' END AS plan_id,
    lpad(CAST(100000000 + (o_custkey*37 + 11) % 800000000 AS VARCHAR), 9, '0') AS ssn_base,
    'First' || CAST(o_custkey % 50 AS VARCHAR) AS first_name,
    'Last' || CAST(o_custkey % 50 AS VARCHAR) AS last_name,
    CASE CAST(o_custkey % 5 AS INTEGER) WHEN 0 THEN 'ca' WHEN 1 THEN 'NY'
      WHEN 2 THEN ' tx' WHEN 3 THEN 'FL ' ELSE 'wa' END AS state_raw
  FROM orders),
relius_raw AS (
  SELECT plan_id,
    CASE WHEN k % 47 = 0 THEN 'BADSSN' ELSE ssn_base END AS ssn_raw,
    first_name AS first_name_raw, last_name AS last_name_raw,
    state_raw AS state,
    CAST(g + CASE WHEN k % 41 = 0 THEN 1 ELSE 0 END AS DOUBLE) AS gross_amt,
    exported_date,
    CAST(year(exported_date) AS BIGINT) AS tax_year,
    CASE CAST(k % 8 AS INTEGER) WHEN 0 THEN '7' WHEN 1 THEN '4' WHEN 2 THEN 'G'
      WHEN 3 THEN '1' WHEN 4 THEN '2' WHEN 5 THEN 'B' WHEN 6 THEN ' 7 '
      ELSE 'ZZ' END AS dist_code_raw,
    CASE CAST(k % 7 AS INTEGER) WHEN 0 THEN 'Rollover to IRA'
      WHEN 1 THEN 'Partial Rollover' WHEN 2 THEN 'RMD Distribution'
      WHEN 3 THEN 'Partial Liquidation' WHEN 4 THEN 'Full Liquidation - Final'
      WHEN 5 THEN 'Recurring Payment' ELSE 'Death Benefit Payment' END AS dist_name,
    k AS ingest_id
  FROM base WHERE k % 37 <> 0
  UNION ALL
  SELECT plan_id, ssn_base, first_name, 'DupLast' || CAST(c % 50 AS VARCHAR),
    state_raw,
    CAST(g + CASE WHEN k % 41 = 0 THEN 1 ELSE 0 END AS DOUBLE), exported_date,
    CAST(year(exported_date) AS BIGINT),
    CASE CAST(k % 8 AS INTEGER) WHEN 0 THEN '7' WHEN 1 THEN '4' WHEN 2 THEN 'G'
      WHEN 3 THEN '1' WHEN 4 THEN '2' WHEN 5 THEN 'B' WHEN 6 THEN ' 7 ' ELSE 'ZZ' END,
    CASE CAST(k % 7 AS INTEGER) WHEN 0 THEN 'Rollover to IRA'
      WHEN 1 THEN 'Partial Rollover' WHEN 2 THEN 'RMD Distribution'
      WHEN 3 THEN 'Partial Liquidation' WHEN 4 THEN 'Full Liquidation - Final'
      WHEN 5 THEN 'Recurring Payment' ELSE 'Death Benefit Payment' END,
    k + 100000000
  FROM base WHERE k % 37 <> 0 AND k % 19 = 0),
relius_norm AS (
  SELECT *,
    regexp_replace(regexp_replace(trim(ssn_raw), '^(\d+)\.0$', '\1'),
      '[^0-9]', '', 'g') AS ssn_digits,
    lower(trim(dist_name)) AS dn
  FROM relius_raw),
relius_clean0 AS (
  SELECT trim(plan_id) AS plan_id,
    CASE WHEN ssn_digits = '' OR length(ssn_digits) > 9 THEN NULL
         ELSE lpad(ssn_digits, 9, '0') END AS ssn,
    first_name_raw AS first_name, last_name_raw AS last_name, state, gross_amt,
    exported_date, tax_year,
    upper(trim(dist_code_raw)) AS dist_code_1, dist_name,
    CASE WHEN dn IS NULL THEN 'other'
         WHEN contains(dn, 'rollover') AND contains(dn, 'partial') THEN 'partial_rollover'
         WHEN contains(dn, 'rollover') THEN 'rollover'
         WHEN contains(dn, 'rmd') THEN 'rmd'
         WHEN contains(dn, 'partial') OR contains(dn, 'recurring') THEN 'partial_cash'
         WHEN contains(dn, 'liquidation') AND contains(dn, 'full') THEN 'final_cash'
         ELSE 'other' END AS dist_category_relius,
    nullif(trim(coalesce(trim(first_name_raw), '') || ' '
      || coalesce(trim(last_name_raw), '')), '') AS full_name,
    ingest_id
  FROM relius_norm),
relius_flags AS (
  SELECT *,
    coalesce(regexp_matches(ssn, '^[0-9]{9}$')
      AND ssn NOT IN ('000000000','999999999','012345678','123456789')
      AND substr(ssn, 1, 3) NOT IN ('000','666')
      AND NOT starts_with(substr(ssn, 1, 3), '9'), FALSE) AS ssn_valid,
    coalesce(gross_amt IS NOT NULL AND NOT (gross_amt < 0)
      AND abs(gross_amt) <= 10000000, FALSE) AS amount_valid,
    coalesce(exported_date IS NOT NULL
      AND year(exported_date) BETWEEN 1990 AND 2050
      AND exported_date <= DATE '2026-01-01', FALSE) AS date_valid,
    coalesce(upper(trim(dist_code_1)) IN
      ('1','2','4','7','8','B','G','H','L','P','Q'), FALSE) AS code_1099r_valid
  FROM relius_clean0),
relius_clean AS MATERIALIZED (
  SELECT *, list_filter([
      CASE WHEN ssn_valid = FALSE THEN 'ssn_invalid' END,
      CASE WHEN amount_valid = FALSE THEN 'amount_invalid' END,
      CASE WHEN date_valid = FALSE THEN 'date_invalid' END,
      CASE WHEN code_1099r_valid = FALSE THEN 'code_1099r_invalid' END],
      x -> x IS NOT NULL) AS validation_issues
  FROM relius_flags
  WHERE plan_id IS NOT NULL AND ssn IS NOT NULL AND gross_amt IS NOT NULL
    AND exported_date IS NOT NULL AND tax_year IS NOT NULL
  QUALIFY row_number() OVER (
    PARTITION BY plan_id, ssn, gross_amt, exported_date, tax_year
    ORDER BY ingest_id) = 1),
matrix_raw0 AS (
  SELECT k, c,
    CASE WHEN k % 11 = 0 THEN '07B00442'
         ELSE 'MA' || lpad(CAST(k % 97 AS VARCHAR), 2, '0') END AS matrix_account,
    plan_id,
    CASE WHEN k % 59 = 0 THEN '0000000000000'
         WHEN k % 6 = 0 THEN substr(ssn_base,1,3) || '-' || substr(ssn_base,4,2)
           || '-' || substr(ssn_base,6,4)
         WHEN k % 6 = 1 THEN ssn_base || '.0'
         ELSE ssn_base END AS ssn_raw,
    first_name || ' ' || last_name AS participant_name,
    state_raw AS state,
    CAST(g AS DOUBLE) AS gross_amt,
    txn_date,
    CASE CAST(k % 9 AS INTEGER) WHEN 0 THEN 'Account Transfer'
      WHEN 1 THEN 'Check  Distribution' WHEN 2 THEN 'Check Distribution'
      WHEN 3 THEN 'ACH Distribution' WHEN 4 THEN 'Wire Transfer'
      WHEN 5 THEN 'Check Distribution' WHEN 6 THEN 'check distribution'
      WHEN 7 THEN 'Suspense Transfer' ELSE 'Check Distribution' END AS txn_method,
    CASE CAST(k % 8 AS INTEGER) WHEN 0 THEN '7' WHEN 1 THEN '4 - Death'
      WHEN 2 THEN 'G - Rollover' WHEN 3 THEN '1 - Early' WHEN 4 THEN '2'
      WHEN 5 THEN 'B - Roth' WHEN 6 THEN 'G' ELSE 'H' END AS tax_code_1_raw,
    CASE CAST(k % 6 AS INTEGER) WHEN 0 THEN NULL WHEN 1 THEN 'G' WHEN 2 THEN '4'
      WHEN 3 THEN 'H' WHEN 4 THEN '' ELSE '7' END AS tax_code_2_raw,
    CASE CAST(k % 5 AS INTEGER) WHEN 0 THEN '1099-R' WHEN 1 THEN 'No Tax'
      WHEN 2 THEN '1099R' WHEN 3 THEN 'W-2' ELSE NULL END AS tax_form_raw,
    CASE CAST(k % 4 AS INTEGER) WHEN 0 THEN 'Rollover' WHEN 1 THEN ' ROLLOVER '
      WHEN 2 THEN 'No Withholding' ELSE NULL END AS ftm_raw,
    CASE CAST(k % 3 AS INTEGER) WHEN 0 THEN 'Normal' WHEN 1 THEN 'Rollover'
      ELSE 'Death' END AS dist_type_raw,
    CASE CAST(k % 6 AS INTEGER) WHEN 0 THEN NULL WHEN 1 THEN 0.0
      WHEN 2 THEN CAST(g*2 AS DOUBLE) WHEN 3 THEN CAST(FLOOR((g*4)/5) AS DOUBLE)
      WHEN 4 THEN CAST(g AS DOUBLE)
      ELSE CAST(FLOOR((g*9)/10) AS DOUBLE) END AS fed_taxable_raw,
    CASE WHEN k % 7 = 0 THEN NULL
         ELSE 2014.0 + CAST(k % 7 AS DOUBLE) END AS roth_year_raw
  FROM base WHERE k % 31 <> 0),
matrix_raw AS (
  SELECT *,
    CASE CAST(k % 6 AS INTEGER) WHEN 0 THEN CAST(k AS VARCHAR)
      WHEN 1 THEN CAST(k AS VARCHAR) || '.0' WHEN 2 THEN 'TX' || CAST(k AS VARCHAR)
      WHEN 3 THEN ' ' || CAST(k AS VARCHAR) || ' '
      WHEN 4 THEN CAST(k AS VARCHAR) || '-9' ELSE NULL END AS txn_id_raw,
    k AS ingest_id
  FROM matrix_raw0
  UNION ALL
  SELECT *, '999' || CAST(k AS VARCHAR), k + 100000000
  FROM matrix_raw0 WHERE k % 43 = 0),
matrix_block AS (
  SELECT * FROM matrix_raw
  WHERE NOT coalesce(matrix_account IN ('07B00442','07I00442','07M00442'), FALSE)
    AND NOT coalesce(lower(trim(txn_method)) IN
      ('account transfer','suspense transfer','ach distribution reject','check stop'),
      FALSE)),
matrix_norm AS (
  SELECT *,
    regexp_replace(regexp_replace(trim(ssn_raw), '^(\d+)\.0$', '\1'),
      '[^0-9]', '', 'g') AS ssn_digits,
    trim(CAST(txn_id_raw AS VARCHAR)) AS tid,
    regexp_extract(trim(CAST(txn_id_raw AS VARCHAR)), '^(\d+)\.0+$', 1) AS tid_defloat,
    regexp_replace(trim(CAST(txn_id_raw AS VARCHAR)), '[^0-9]', '', 'g') AS tid_digits
  FROM matrix_block),
matrix_clean0 AS (
  SELECT trim(plan_id) AS plan_id,
    CASE WHEN ssn_digits = '' OR length(ssn_digits) > 9 THEN NULL
         ELSE lpad(ssn_digits, 9, '0') END AS ssn,
    trim(participant_name) AS participant_name,
    upper(trim(state)) AS state,
    gross_amt,
    fed_taxable_raw AS fed_taxable_amt,
    txn_date,
    trim(txn_method) AS txn_method,
    upper(nullif(regexp_extract(tax_code_1_raw, '^\s*([A-Za-z0-9]{1,2})', 1), ''))
      AS tax_code_1,
    upper(nullif(regexp_extract(tax_code_2_raw, '^\s*([A-Za-z0-9]{1,2})', 1), ''))
      AS tax_code_2,
    trim(tax_form_raw) AS tax_form,
    trim(ftm_raw) AS federal_taxing_method,
    trim(dist_type_raw) AS dist_type,
    CAST(TRUNC(roth_year_raw) AS BIGINT) AS roth_initial_contribution_year,
    CASE WHEN tid IS NULL OR tid = '' THEN NULL
         WHEN tid_defloat <> '' THEN tid_defloat
         WHEN regexp_matches(tid, '^\d+$') THEN tid
         WHEN regexp_matches(tid, '[A-Za-z]') THEN NULL
         WHEN tid_digits = '' THEN NULL
         ELSE tid_digits END AS transaction_id,
    matrix_account,
    ingest_id
  FROM matrix_norm),
matrix_flags AS (
  SELECT *,
    coalesce(regexp_matches(ssn, '^[0-9]{9}$')
      AND ssn NOT IN ('000000000','999999999','012345678','123456789')
      AND substr(ssn, 1, 3) NOT IN ('000','666')
      AND NOT starts_with(substr(ssn, 1, 3), '9'), FALSE) AS ssn_valid,
    coalesce(gross_amt IS NOT NULL AND NOT (gross_amt < 0)
      AND abs(gross_amt) <= 10000000 AND fed_taxable_amt IS NOT NULL
      AND fed_taxable_amt >= 0 AND fed_taxable_amt <= gross_amt, FALSE) AS amount_valid,
    coalesce(txn_date IS NOT NULL AND year(txn_date) BETWEEN 1990 AND 2050
      AND txn_date <= DATE '2026-01-01', FALSE) AS date_valid,
    coalesce(upper(trim(tax_code_1)) IN
      ('1','2','4','7','8','B','G','H','L','P','Q'), FALSE) AS code_1099r_valid,
    list_filter([
      CASE WHEN gross_amt IS NOT NULL AND fed_taxable_amt IS NOT NULL
        AND upper(trim(tax_code_1)) = 'G'
        AND fed_taxable_amt > gross_amt * 0.1
        THEN 'cross_code_g_taxable_over_10pct' END,
      CASE WHEN gross_amt IS NOT NULL AND fed_taxable_amt IS NOT NULL
        AND fed_taxable_amt > gross_amt * 1.5
        THEN 'cross_taxable_exceeds_gross_150pct' END],
      x -> x IS NOT NULL) AS cross_issues
  FROM matrix_clean0),
matrix_clean AS MATERIALIZED (
  SELECT *, list_filter([
      CASE WHEN ssn_valid = FALSE THEN 'ssn_invalid' END,
      CASE WHEN amount_valid = FALSE THEN 'amount_invalid' END,
      CASE WHEN date_valid = FALSE THEN 'date_invalid' END,
      CASE WHEN code_1099r_valid = FALSE THEN 'code_1099r_invalid' END]
      || coalesce(cross_issues, []),
      x -> x IS NOT NULL) AS validation_issues
  FROM matrix_flags
  WHERE plan_id IS NOT NULL AND ssn IS NOT NULL AND gross_amt IS NOT NULL
    AND txn_date IS NOT NULL
  QUALIFY row_number() OVER (
    PARTITION BY plan_id, ssn, gross_amt, txn_date ORDER BY ingest_id) = 1),
demo_raw0 AS (
  SELECT k, c, plan_id, ssn_base, first_name, last_name,
    DATE '1945-01-01' + CAST((c*13) % 18263 AS INTEGER) AS dob0
  FROM base WHERE k % 5 <> 4),
demo_raw AS (
  SELECT plan_id, ssn_base, first_name, last_name, dob0 AS dob,
    CASE WHEN c % 3 = 0 THEN NULL
         ELSE dob0 + CAST(18000 + (c % 4000) AS INTEGER) END AS term_date,
    k AS ingest_id
  FROM demo_raw0
  UNION ALL
  SELECT plan_id, ssn_base, first_name, last_name, dob0 + 1,
    CASE WHEN c % 3 = 0 THEN NULL
         ELSE (dob0 + 1) + CAST(18000 + (c % 4000) AS INTEGER) END,
    k + 100000000
  FROM demo_raw0 WHERE k % 23 = 0),
demo_clean AS MATERIALIZED (
  SELECT trim(plan_id) AS plan_id, ssn_base AS ssn,
    trim(first_name) AS first_name, trim(last_name) AS last_name,
    dob, term_date,
    coalesce(regexp_matches(ssn_base, '^[0-9]{9}$')
      AND ssn_base NOT IN ('000000000','999999999','012345678','123456789')
      AND substr(ssn_base, 1, 3) NOT IN ('000','666')
      AND NOT starts_with(substr(ssn_base, 1, 3), '9'), FALSE) AS ssn_valid,
    CASE WHEN term_date IS NULL THEN NULL
         ELSE coalesce(year(term_date) BETWEEN 1990 AND 2050
           AND term_date <= DATE '2026-01-01', FALSE) END AS date_valid,
    ingest_id
  FROM demo_raw
  QUALIFY row_number() OVER (PARTITION BY trim(plan_id), ssn_base
    ORDER BY ingest_id DESC) = 1),
basis_raw0 AS (
  SELECT k, c, plan_id, ssn_base, first_name, last_name,
    CASE CAST(c % 6 AS INTEGER) WHEN 0 THEN NULL WHEN 1 THEN 2012.0
      WHEN 2 THEN 2018.0 WHEN 3 THEN 1800.0 WHEN 4 THEN 2020.0
      ELSE 2021.5 END AS year_raw,
    CASE WHEN c % 5 = 0 THEN NULL
         ELSE CAST((c*7) % 5000 AS DOUBLE) END AS total_raw
  FROM base WHERE k % 2 = 0),
basis_raw AS (
  SELECT plan_id, ssn_base, first_name, last_name, year_raw, total_raw,
    k AS ingest_id
  FROM basis_raw0
  UNION ALL
  SELECT plan_id, ssn_base, first_name, last_name, NULL, NULL, k + 100000000
  FROM basis_raw0 WHERE k % 29 = 0),
basis_clean AS MATERIALIZED (
  SELECT trim(plan_id) AS plan_id, ssn_base AS ssn,
    trim(first_name) AS first_name, trim(last_name) AS last_name,
    CAST(TRUNC(year_raw) AS BIGINT) AS first_roth_tax_year,
    total_raw AS roth_basis_amt,
    ingest_id
  FROM basis_raw
  QUALIFY row_number() OVER (PARTITION BY trim(plan_id), ssn_base
    ORDER BY (CASE WHEN CAST(TRUNC(year_raw) AS BIGINT) IS NOT NULL THEN 1 ELSE 0 END
              + CASE WHEN total_raw IS NOT NULL THEN 1 ELSE 0 END) DESC,
             ingest_id ASC) = 1)"""

  /** Engine A CTEs (twin of graft.engines.MatchPlanId under the default
    * inherited-plan scope), ending in `ea` with classified rows.
    */
  val EngineA: String = """
er AS (SELECT * FROM relius_clean
       WHERE plan_id IN ('300004PLAT','300004MBD','300004MBDII')),
em AS (SELECT * FROM matrix_clean
       WHERE plan_id IN ('300004PLAT','300004MBD','300004MBDII')),
ea0 AS (
  SELECT coalesce(r.plan_id, m.plan_id) AS plan_id,
    coalesce(r.ssn, m.ssn) AS ssn,
    coalesce(r.gross_amt, m.gross_amt) AS gross_amt,
    CASE WHEN r.ingest_id IS NOT NULL AND m.ingest_id IS NOT NULL THEN 'both'
         WHEN r.ingest_id IS NOT NULL THEN 'left_only'
         ELSE 'right_only' END AS _merge,
    r.exported_date, m.txn_date, r.tax_year, r.dist_code_1,
    r.dist_category_relius, r.full_name,
    m.tax_code_1, m.tax_code_2, m.transaction_id, m.matrix_account,
    m.participant_name, m.fed_taxable_amt
  FROM er r FULL OUTER JOIN em m
    ON r.plan_id = m.plan_id AND r.ssn = m.ssn AND r.gross_amt = m.gross_amt),
ea1 AS (
  SELECT *,
    CAST(txn_date - exported_date AS INTEGER) AS date_lag_days,
    coalesce((txn_date - exported_date) >= 0
      AND (txn_date - exported_date) <= 10, FALSE) AS date_within_tolerance,
    _merge = 'both' AS is_both,
    plan_id IN ('300004PLAT','300004MBD','300004MBDII') AS is_inherited,
    coalesce(dist_category_relius IN ('rollover','partial_rollover'), FALSE)
      AS is_rollover
  FROM ea0),
ea2 AS (
  SELECT *,
    CASE WHEN (is_both AND is_inherited AND is_rollover)
           OR (is_both AND is_inherited AND NOT is_rollover) THEN '4' END
      AS expected_tax_code_1,
    CASE WHEN is_both AND is_inherited AND is_rollover THEN 'G' END
      AS expected_tax_code_2,
    is_both AND is_inherited AND is_rollover AS mask_rollover,
    is_both AND is_inherited AND NOT is_rollover AS mask_cash
  FROM ea1),
ea3 AS (
  SELECT *,
    (coalesce(tax_code_1, '') = coalesce(expected_tax_code_1, '')
      AND coalesce(tax_code_2, '') = coalesce(expected_tax_code_2, ''))
      AS code_matches_expected,
    (is_both AND expected_tax_code_1 IS NOT NULL
      AND NOT (coalesce(tax_code_1, '') = coalesce(expected_tax_code_1, '')
        AND coalesce(tax_code_2, '') = coalesce(expected_tax_code_2, '')))
      AS needs_correction
  FROM ea2),
ea AS MATERIALIZED (
  SELECT *,
    CASE WHEN needs_correction THEN expected_tax_code_1 END AS suggested_tax_code_1,
    CASE WHEN needs_correction THEN expected_tax_code_2 END AS suggested_tax_code_2,
    CASE WHEN needs_correction AND mask_rollover
           THEN 'inherited_rollover_expected_G_and_4'
         WHEN needs_correction AND mask_cash THEN 'inherited_cash_expected_4' END
      AS correction_reason,
    CASE WHEN needs_correction THEN 'UPDATE_1099' END AS action,
    CASE WHEN _merge = 'left_only' THEN 'unmatched_relius'
         WHEN _merge = 'right_only' THEN 'unmatched_matrix'
         WHEN is_both AND date_within_tolerance AND needs_correction
           THEN 'match_needs_correction'
         WHEN is_both AND date_within_tolerance THEN 'match_no_action'
         WHEN is_both THEN 'date_out_of_range' END AS match_status,
    CASE WHEN needs_correction AND expected_tax_code_1 IS NOT NULL
      THEN expected_tax_code_1 || coalesce(
        CASE WHEN needs_correction THEN expected_tax_code_2 END, '') END
      AS new_tax_code
  FROM ea3)"""

  /** Engine A without the plan-scope filter (scale-stress variant): same
    * CTE chain over the full cleaned inputs.
    */
  val EngineAAll: String = EngineA
    .replace(
      """er AS (SELECT * FROM relius_clean
        |       WHERE plan_id IN ('300004PLAT','300004MBD','300004MBDII')),""".stripMargin,
      "er AS (SELECT * FROM relius_clean),")
    .replace(
      """em AS (SELECT * FROM matrix_clean
        |       WHERE plan_id IN ('300004PLAT','300004MBD','300004MBDII')),""".stripMargin,
      "em AS (SELECT * FROM matrix_clean),")

  /** Engine B CTEs (twin of graft.engines.AgeTaxCode), ending in `eb`. */
  val EngineB: String = """
eb0 AS (
  SELECT m.*, d.dob, d.term_date, d.first_name, d.last_name,
    coalesce(m.participant_name,
      nullif(trim(coalesce(trim(d.first_name), '') || ' '
        || coalesce(trim(d.last_name), '')), '')) AS full_name
  FROM matrix_clean m LEFT JOIN demo_clean d
    ON m.plan_id = d.plan_id AND m.ssn = d.ssn
  WHERE NOT (starts_with(upper(trim(m.plan_id)), '300005')
    OR ends_with(upper(trim(m.plan_id)), 'R'))),
eb1 AS (
  SELECT *,
    coalesce(tax_code_1 IN ('G','H','11','13','15','16','17','18','19','33','4'),
      FALSE)
      OR plan_id IN ('300004PLAT','300004MBD','300004MBDII') AS age_engine_excluded,
    CAST(year(dob) AS BIGINT) AS dob_year,
    CAST(year(txn_date) AS BIGINT) AS txn_year,
    CAST(year(term_date) AS BIGINT) AS term_year,
    CAST(year(txn_date) - year(dob) AS DOUBLE) AS age_at_distribution_year,
    CAST(year(term_date) - year(dob) AS DOUBLE) AS age_at_termination_year,
    coalesce(CAST(dob + INTERVAL 59 YEAR + INTERVAL 6 MONTH AS DATE)
      <= make_date(CAST(year(txn_date) AS INTEGER), 12, 31), FALSE)
      AS attained_59_5_in_txn_year,
    coalesce(CAST(dob + INTERVAL 55 YEAR AS DATE)
      <= make_date(CAST(year(txn_date) AS INTEGER), 12, 31), FALSE)
      AS attained_55_in_txn_year,
    coalesce(CAST(dob + INTERVAL 55 YEAR AS DATE)
      <= make_date(CAST(year(term_date) AS INTEGER), 12, 31), FALSE)
      AS attained_55_in_term_year
  FROM eb0),
eb2 AS (
  SELECT *,
    NOT age_engine_excluded AND dob IS NOT NULL AND txn_year IS NOT NULL AS eligible
  FROM eb1),
eb3 AS (
  SELECT *,
    eligible AND attained_59_5_in_txn_year AS mask_normal,
    eligible AND NOT (eligible AND attained_59_5_in_txn_year) AS mask_under
  FROM eb2),
eb4 AS (
  SELECT *,
    CASE WHEN mask_normal THEN '7'
         WHEN mask_under AND term_year IS NOT NULL AND attained_55_in_term_year THEN '2'
         WHEN mask_under AND term_year IS NOT NULL AND NOT attained_55_in_term_year THEN '1'
         WHEN mask_under AND term_year IS NULL AND NOT attained_55_in_txn_year THEN '1'
         WHEN mask_under AND term_year IS NULL AND attained_55_in_txn_year THEN '2' END
      AS expected_tax_code_1,
    CASE WHEN mask_normal THEN 'age_59_5_or_over_normal_distribution'
         WHEN mask_under AND term_year IS NOT NULL AND attained_55_in_term_year
           THEN 'terminated_at_or_after_55'
         WHEN mask_under AND term_year IS NOT NULL AND NOT attained_55_in_term_year
           THEN 'terminated_before_55'
         WHEN mask_under AND term_year IS NULL AND NOT attained_55_in_txn_year
           THEN 'no_term_date_under_55_in_txn_year'
         WHEN mask_under AND term_year IS NULL AND attained_55_in_txn_year
           THEN 'no_term_date_55_plus_in_txn_year' END AS reason_ladder
  FROM eb3),
eb5 AS (
  SELECT *,
    (expected_tax_code_1 IS NOT NULL
      AND coalesce(tax_code_1, '') = coalesce(expected_tax_code_1, ''))
      AS code_matches_expected,
    (expected_tax_code_1 IS NOT NULL
      AND NOT (coalesce(tax_code_1, '') = coalesce(expected_tax_code_1, ''))
      AND NOT age_engine_excluded) AS need_corr
  FROM eb4),
eb6 AS (
  SELECT *,
    CASE WHEN code_matches_expected THEN 'match_no_action'
         WHEN need_corr THEN 'match_needs_correction'
         WHEN age_engine_excluded THEN 'excluded_from_age_engine_rollover_or_inherited'
         ELSE 'age_rule_insufficient_data' END AS match_status,
    CASE WHEN need_corr THEN 'UPDATE_1099' END AS action,
    CASE WHEN NOT code_matches_expected THEN reason_ladder END AS correction_reason
  FROM eb5),
eb AS MATERIALIZED (
  SELECT *,
    CASE WHEN match_status <> 'match_no_action' THEN expected_tax_code_1 END
      AS suggested_tax_code_1,
    CAST(NULL AS VARCHAR) AS suggested_tax_code_2,
    CASE WHEN match_status <> 'match_no_action' AND expected_tax_code_1 IS NOT NULL
      THEN expected_tax_code_1 END AS new_tax_code
  FROM eb6)"""

  /** Engine C CTEs (twin of graft.engines.RothTaxable), ending in `ec`. */
  val EngineC: String = """
ecm AS (
  SELECT * FROM matrix_clean
  WHERE (starts_with(coalesce(trim(plan_id), ''), '300005')
      OR ends_with(coalesce(trim(plan_id), ''), 'R'))
    AND plan_id NOT IN ('300004PLAT','300004MBD','300004MBDII')),
ec0 AS (
  SELECT m.*, d.dob, d.term_date,
    b.first_roth_tax_year AS b_first_year, b.roth_basis_amt
  FROM ecm m
  LEFT JOIN demo_clean d ON m.plan_id = d.plan_id AND m.ssn = d.ssn
  LEFT JOIN basis_clean b ON m.plan_id = b.plan_id AND m.ssn = b.ssn),
ec1 AS (
  SELECT *,
    CAST(year(txn_date) AS BIGINT) AS txn_year,
    CAST(year(term_date) AS BIGINT) AS term_year,
    CAST(year(txn_date) - year(dob) AS DOUBLE) AS age_at_txn,
    fed_taxable_amt AS fed_d,
    CAST(b_first_year AS DOUBLE) AS first_roth_d,
    CAST(roth_initial_contribution_year AS DOUBLE) AS roth_init_d
  FROM ec0),
ec2 AS (
  SELECT *,
    sum(CASE WHEN txn_year = 2025 THEN gross_amt END)
      OVER (PARTITION BY plan_id, ssn) AS gross_2025_total,
    (first_roth_d IS NOT NULL AND first_roth_d > 0
      AND first_roth_d BETWEEN 1900 AND 2100) AS first_year_valid,
    coalesce(tax_code_1, '') AS cc1, coalesce(tax_code_2, '') AS cc2,
    coalesce(
      CASE WHEN round(first_roth_d) = first_roth_d
        THEN CAST(TRUNC(first_roth_d) AS BIGINT) END,
      CASE WHEN round(roth_init_d) = roth_init_d
        THEN CAST(TRUNC(roth_init_d) AS BIGINT) END) AS start_year0,
    coalesce(CAST(dob + INTERVAL 59 YEAR + INTERVAL 6 MONTH AS DATE)
      <= make_date(CAST(year(txn_date) AS INTEGER), 12, 31), FALSE) AS att595,
    coalesce(CAST(dob + INTERVAL 55 YEAR AS DATE)
      <= make_date(CAST(year(txn_date) AS INTEGER), 12, 31), FALSE) AS att55txn,
    coalesce(CAST(dob + INTERVAL 55 YEAR AS DATE)
      <= make_date(CAST(year(term_date) AS INTEGER), 12, 31), FALSE) AS att55term
  FROM ec1),
ec3 AS (
  SELECT *,
    (start_year0 IS NOT NULL AND start_year0 > 0
      AND start_year0 BETWEEN 1900 AND 2100) AS start_year_valid,
    cc1 IN ('11','13','15','16','17','18','19','33') AS excluded,
    ((cc1 = 'H') OR (cc1 = 'B' AND cc2 = '4')) AS tax_code_locked
  FROM ec2),
ec4 AS (
  SELECT *,
    CASE WHEN start_year_valid THEN start_year0 END AS start_roth_year,
    (cc1='B' AND cc2='G' AND NOT excluded) AS fix_bg,
    (cc1='G' AND cc2='4' AND NOT excluded) AS fix_g4,
    (cc1='4' AND cc2='' AND NOT excluded) AS fix_4b,
    (cc2='4' AND cc1='' AND NOT excluded) AS fix_b4,
    (cc1='G' AND cc2='' AND NOT excluded) AS fix_gb,
    (cc1='' AND cc2='G' AND NOT excluded) AS fix_bgx,
    NOT excluded AS active,
    (NOT excluded AND roth_basis_amt IS NOT NULL
      AND gross_2025_total IS NOT NULL
      AND roth_basis_amt >= gross_2025_total) AS basis_mask
  FROM ec3),
ec5 AS (
  SELECT *,
    (fix_bg OR fix_g4 OR fix_4b OR fix_b4 OR fix_gb OR fix_bgx) AS override_mask,
    (active AND att595 AND start_year_valid
      AND coalesce(txn_year - start_roth_year >= 5, FALSE)) AS qualified_mask_raw
  FROM ec4),
ec6 AS (
  SELECT *,
    CASE WHEN basis_mask OR qualified_mask_raw THEN 0.0 END AS suggested_taxable0,
    (active AND (basis_mask OR qualified_mask_raw)) AS taxable_suggested
  FROM ec5),
ec7 AS (
  SELECT *,
    (taxable_suggested AND fed_d IS NULL) AS taxable_missing,
    (taxable_suggested AND fed_d IS NOT NULL
      AND abs(fed_d - suggested_taxable0) > 0.01) AS taxable_change,
    (active AND first_year_valid AND (roth_init_d IS NULL
      OR NOT (roth_init_d IS NOT DISTINCT FROM first_roth_d))) AS year_change,
    (active AND NOT first_year_valid) AS missing_first_year,
    (active AND coalesce(fed_d > 0, FALSE)
      AND coalesce(gross_amt <= fed_d * 1.15, FALSE)) AS proximity_mask,
    (active AND NOT (fix_bg OR fix_g4 OR fix_4b OR fix_b4 OR fix_gb OR fix_bgx)
      AND NOT tax_code_locked AND dob IS NOT NULL AND txn_year IS NOT NULL)
      AS age_applicable
  FROM ec6),
ec8 AS (
  SELECT *,
    (age_applicable AND att595) AS age_normal,
    (age_applicable AND NOT (age_applicable AND att595)) AS under_normal
  FROM ec7),
ec9 AS (
  SELECT *,
    CASE WHEN age_normal THEN '7'
         WHEN under_normal AND term_year IS NOT NULL AND att55term THEN '2'
         WHEN under_normal AND term_year IS NOT NULL AND NOT att55term THEN '1'
         WHEN under_normal AND term_year IS NULL AND NOT att55txn THEN '1'
         WHEN under_normal AND term_year IS NULL AND att55txn THEN '2' END
      AS expected_code2
  FROM ec8),
ec10 AS (
  SELECT *,
    (age_applicable AND (cc1 <> 'B' OR (expected_code2 IS NOT NULL
      AND cc2 <> coalesce(expected_code2, '')))) AS age_mismatch
  FROM ec9),
ec11 AS (
  SELECT *,
    coalesce(
      CASE WHEN fix_bg OR fix_g4 OR fix_gb OR fix_bgx THEN 'H'
           WHEN fix_4b OR fix_b4 THEN 'B' END,
      CASE WHEN age_mismatch THEN 'B' END) AS sug1,
    coalesce(
      CASE WHEN fix_g4 OR fix_4b OR fix_b4 THEN '4' END,
      CASE WHEN age_mismatch AND expected_code2 IS NOT NULL
        THEN expected_code2 END) AS sug2,
    (override_mask OR year_change OR taxable_change OR age_mismatch) AS has_update,
    (taxable_missing OR missing_first_year OR proximity_mask) AS has_investigate,
    (override_mask OR year_change
      OR (NOT (taxable_missing OR missing_first_year) AND taxable_change)
      OR (NOT (taxable_missing OR missing_first_year OR proximity_mask)
        AND age_mismatch)) AS update_first,
    (age_mismatch AND expected_code2 IS NOT NULL) AS age_update
  FROM ec10),
ec12 AS (
  SELECT *,
    CASE WHEN has_update AND has_investigate THEN
           CASE WHEN update_first THEN ['UPDATE_1099','INVESTIGATE']
                ELSE ['INVESTIGATE','UPDATE_1099'] END
         WHEN has_update THEN ['UPDATE_1099']
         WHEN has_investigate THEN ['INVESTIGATE']
         ELSE CAST([] AS VARCHAR[]) END AS actions,
    list_filter([
      CASE WHEN fix_bg THEN 'roth_rollover_code_fix_B_G_to_H' END,
      CASE WHEN fix_g4 THEN 'roth_rollover_code_fix_G_4_to_H_4' END,
      CASE WHEN fix_4b THEN 'roth_death_code_fix_4_to_B_4' END,
      CASE WHEN fix_b4 THEN 'roth_death_code_fix_blank_4_to_B_4' END,
      CASE WHEN fix_gb THEN 'roth_rollover_code_fix_G_blank_to_H' END,
      CASE WHEN fix_bgx THEN 'roth_rollover_code_fix_blank_G_to_H' END,
      CASE WHEN year_change THEN 'roth_initial_year_mismatch' END,
      CASE WHEN missing_first_year THEN 'missing_first_roth_tax_year' END,
      CASE WHEN basis_mask THEN 'roth_basis_covers_2025_total' END,
      CASE WHEN qualified_mask_raw THEN 'qualified_roth_distribution' END,
      CASE WHEN taxable_missing THEN 'missing_fed_taxable_amt' END,
      CASE WHEN proximity_mask THEN 'taxable_within_15pct_of_gross' END,
      CASE WHEN age_mismatch THEN 'roth_age_tax_code_mismatch' END,
      CASE WHEN age_update AND att595
        THEN 'roth_age_rule_attained_59_5_in_txn_year_expect_B7' END,
      CASE WHEN age_update AND NOT att595 AND term_year IS NOT NULL AND att55term
        THEN 'roth_age_rule_attained_55_in_term_year_expect_B2' END,
      CASE WHEN age_update AND NOT att595 AND term_year IS NOT NULL
        AND NOT att55term
        THEN 'roth_age_rule_under_55_in_term_year_expect_B1' END,
      CASE WHEN age_update AND NOT att595 AND term_year IS NULL AND att55txn
        THEN 'roth_age_rule_attained_55_in_txn_year_no_term_expect_B2' END,
      CASE WHEN age_update AND NOT att595 AND term_year IS NULL AND NOT att55txn
        THEN 'roth_age_rule_under_55_in_txn_year_no_term_expect_B1' END],
      x -> x IS NOT NULL) AS reasons
  FROM ec11),
ec13 AS (
  SELECT *,
    CASE WHEN excluded THEN 'excluded_from_age_engine_rollover_or_inherited'
         WHEN list_contains(actions, 'UPDATE_1099') THEN 'match_needs_correction'
         WHEN list_contains(actions, 'INVESTIGATE') THEN 'match_needs_review'
         ELSE 'match_no_action' END AS match_status
  FROM ec12),
ec AS MATERIALIZED (
  SELECT *,
    CASE WHEN len(actions) > 0 THEN array_to_string(actions, chr(10)) END AS action,
    CASE WHEN match_status = 'match_no_action' THEN NULL
         ELSE CASE WHEN len(reasons) > 0 THEN array_to_string(
           list_transform(reasons, x -> '- ' || x), chr(10)) END END
      AS correction_reason,
    CASE WHEN match_status <> 'match_no_action' THEN sug1 END AS suggested_tax_code_1,
    CASE WHEN match_status <> 'match_no_action' THEN sug2 END AS suggested_tax_code_2,
    CASE WHEN match_status = 'match_no_action' AND fed_d = 0 THEN NULL
         ELSE suggested_taxable0 END AS suggested_taxable_amt,
    CASE WHEN year_change THEN first_roth_d END AS suggested_first_roth_tax_year
  FROM ec13)"""

  /** Engine D CTEs (twin of graft.engines.IraRollover), ending in `ed`. */
  val EngineD: String = """
ed0 AS (
  SELECT * FROM matrix_clean
  WHERE (starts_with(upper(trim(plan_id)), '300001')
      OR starts_with(upper(trim(plan_id)), '300005')
      OR contains(upper(trim(plan_id)), 'IRA'))
    AND coalesce(lower(regexp_replace(trim(txn_method), '\s+', ' ', 'g'))
      = 'check distribution', FALSE)
    AND (coalesce(tax_code_1, '') IN ('G','H')
      OR coalesce(tax_code_2, '') IN ('G','H'))),
ed1 AS (
  SELECT *,
    replace(regexp_replace(upper(trim(federal_taxing_method)), '\s+', '', 'g'),
      '-', '') AS ftm,
    replace(regexp_replace(upper(trim(tax_form)), '\s+', '', 'g'), '-', '')
      AS form
  FROM ed0),
ed2 AS (
  SELECT *,
    (ftm IS NULL OR ftm = '') AS missing_ftm,
    (form IS NULL OR form = '') AS missing_form,
    coalesce(ftm = 'ROLLOVER', FALSE) AS ftm_rollover,
    coalesce(form = 'NOTAX', FALSE) AS form_notax,
    coalesce(form = '1099R', FALSE) AS form_1099r
  FROM ed1),
ed3 AS (
  SELECT *,
    NOT missing_ftm AND NOT ftm_rollover AS ftm_non_rollover,
    NOT missing_form AND NOT form_notax AND NOT form_1099r AS form_unknown,
    ftm_rollover AND form_notax AS mask_no_action,
    ftm_rollover AND form_1099r AS mask_correction
  FROM ed2),
ed AS MATERIALIZED (
  SELECT *,
    CASE WHEN mask_no_action THEN 'match_no_action'
         WHEN mask_correction THEN 'match_needs_correction'
         ELSE 'match_needs_review' END AS match_status,
    CASE WHEN mask_correction THEN 'UPDATE_1099'
         WHEN NOT mask_no_action THEN 'INVESTIGATE' END AS action,
    CASE WHEN mask_correction THEN '0' END AS suggested_tax_code_1,
    CASE WHEN mask_correction THEN '0' END AS new_tax_code,
    CASE WHEN mask_correction THEN 'ira_rollover_tax_form_1099r_expected_no_tax'
         WHEN mask_no_action THEN NULL
         ELSE (CASE WHEN len(list_filter([
             CASE WHEN missing_ftm THEN 'missing_federal_taxing_method' END,
             CASE WHEN missing_form THEN 'missing_tax_form' END,
             CASE WHEN NOT missing_ftm AND NOT ftm_rollover
               THEN 'federal_taxing_method_not_rollover' END,
             CASE WHEN NOT missing_form AND NOT form_notax AND NOT form_1099r
               THEN 'unrecognized_tax_form' END], x -> x IS NOT NULL)) > 0
           THEN array_to_string(list_filter([
             CASE WHEN missing_ftm THEN 'missing_federal_taxing_method' END,
             CASE WHEN missing_form THEN 'missing_tax_form' END,
             CASE WHEN NOT missing_ftm AND NOT ftm_rollover
               THEN 'federal_taxing_method_not_rollover' END,
             CASE WHEN NOT missing_form AND NOT form_notax AND NOT form_1099r
               THEN 'unrecognized_tax_form' END], x -> x IS NOT NULL), '; ') END)
      END AS correction_reason
  FROM ed3)"""

  /** Wrap a final SELECT with the prelude (+ optional extra CTE blocks). */
  def query(finalSelect: String, extraCtes: String*): String =
    "WITH " + (Prelude +: extraCtes).mkString(",") + "\n" + finalSelect
}
