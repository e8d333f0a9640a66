package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The engine's expression library: every scalar normalizer from the
  * reference, re-expressed as a native `Column => Column` function so the
  * whole pipeline stays inside Catalyst/whole-stage codegen (no UDFs).
  *
  * Semantics are transcribed from `/root/reference/src/core/normalizers.py`
  * and the cleaner-local helpers; each function cites its source.
  *
  * NOTE: sessions must run with `spark.sql.ansi.enabled=false` so that
  * `cast` has pandas' `errors="coerce"` (invalid -> NULL) semantics.
  */
object Normalizers {

  private val nullString: Column = lit(null).cast(StringType)

  /** F1 — normalize SSN to a 9-digit string (string inputs).
    * reference: src/core/normalizers.py:59-95.
    *   - strips a trailing ".0" float artifact (`^\d+\.0$`)
    *   - removes all non-digits
    *   - left-pads to 9 when shorter; NULL when empty or >9 digits after
    *     padding (no truncation — the docstring at
    *     src/cleaning/clean_matrix.py:43 claims truncation but the code
    *     never truncates; we replicate the code, not the docstring)
    */
  def normalizeSsn(c: Column): Column = {
    val s = trim(c.cast(StringType))
    val defloated = regexp_replace(s, "^(\\d+)\\.0$", "$1")
    val digits = regexp_replace(defloated, "[^0-9]", "")
    when(digits === "" || length(digits) > 9, nullString)
      .otherwise(lpad(digits, 9, "0"))
  }

  /** F1 numeric-input variant: integral numerics are zero-padded with NO
    * length-9 check (reference integral path returns `f"{int(v):09d}"`
    * unvalidated, src/core/normalizers.py:66-74); fractional -> NULL.
    */
  def normalizeSsnNumeric(c: Column): Column = {
    val asStr = c.cast(DecimalType(38, 0)).cast(StringType)
    when(c.isNotNull && c === floor(c),
      when(length(asStr) >= 9, asStr).otherwise(lpad(asStr, 9, "0")))
      .otherwise(nullString)
  }

  /** F2 — plan id: cast to string + strip. reference src/core/normalizers.py:103-111. */
  def normalizePlanId(c: Column): Column = trim(c.cast(StringType))

  /** F3 — parse to date, coerce invalid to NULL, drop time-of-day.
    * reference src/core/normalizers.py:114-124.
    */
  def toDate(c: Column): Column = to_date(c)

  /** F4 — year as nullable int. reference src/core/normalizers.py:152-156. */
  def yearFromDate(c: Column): Column = year(to_date(c)).cast(LongType)

  /** F5 — attained-age flag: dob + years + months <= Dec 31 of `yearCol`;
    * false when dob/year invalid. reference src/core/normalizers.py:159-181.
    * Two-step add (years then months) replicates pandas
    * `DateOffset(years=, months=)` end-of-month clamping for Feb-29 dobs.
    */
  def attainedAgeByYearEnd(dob: Column, yearCol: Column, years: Int, months: Int = 0): Column = {
    val threshold = add_months(add_months(to_date(dob), years * 12), months)
    val yearEnd = make_date(yearCol.cast(IntegerType), lit(12), lit(31))
    coalesce(threshold <= yearEnd, lit(false))
  }

  /** F6 — numeric coercion, invalid -> NULL. reference src/core/normalizers.py:183-187. */
  def toNumeric(c: Column): Column = c.cast(DoubleType)

  /** F7 — nullable-int coercion; two-step cast mirrors float-ish inputs
    * like "2016.0". reference src/core/normalizers.py:190-194.
    */
  def toInt64(c: Column): Column = c.cast(DoubleType).cast(LongType)

  /** F8 — text normalization with optional strip/upper.
    * reference src/core/normalizers.py:197-209.
    */
  def normalizeText(c: Column, strip: Boolean = true, upper: Boolean = false): Column = {
    val s0 = c.cast(StringType)
    val s1 = if (strip) trim(s0) else s0
    if (upper) org.apache.spark.sql.functions.upper(s1) else s1
  }

  /** F9 — state: strip + upper. reference src/core/normalizers.py:212-214. */
  def normalizeState(c: Column): Column = upper(trim(c.cast(StringType)))

  /** F10 — leading 1–2 alphanumeric tax-code chars, uppercased; no
    * match -> NULL ("7 - Normal" -> "7"). reference src/core/normalizers.py:217-239.
    * Spark regexp_extract yields "" on no-match -> nullif.
    */
  def normalizeTaxCode(c: Column): Column =
    upper(nullif(regexp_extract(c.cast(StringType), "^\\s*([A-Za-z0-9]{1,2})", 1), lit("")))

  /** F11 — compact uppercase token: strip, upper, remove whitespace and
    * hyphens ("1099-R" -> "1099R"). reference src/core/normalizers.py:242-250.
    */
  def normalizeCompactUpper(c: Column): Column =
    regexp_replace(regexp_replace(upper(trim(c.cast(StringType))), "\\s+", ""), "-", "")

  /** F12 — lowercase with collapsed inner whitespace.
    * reference src/core/normalizers.py:253-260.
    */
  def normalizeSpaceLower(c: Column): Column =
    lower(regexp_replace(trim(c.cast(StringType)), "\\s+", " "))

  /** F13 — transaction id from Excel float artifact (string inputs).
    * reference src/cleaning/clean_matrix.py:166-215.
    * "44324568.0" -> "44324568"; pure digits pass; any letter -> NULL;
    * otherwise strip non-digits; empty -> NULL.
    */
  def normalizeTransactionId(c: Column): Column = {
    val s = trim(c.cast(StringType))
    val defloated = regexp_extract(s, "^(\\d+)\\.0+$", 1)
    val stripped = regexp_replace(s, "[^0-9]", "")
    when(s.isNull || s === "", nullString)
      .when(defloated =!= "", defloated)
      .when(s.rlike("^\\d+$"), s)
      .when(s.rlike("[A-Za-z]"), nullString)
      .when(stripped === "", nullString)
      .otherwise(stripped)
  }

  /** F14 — free-text dist_name -> category. reference
    * src/cleaning/clean_relius.py:155-195. Replicates the reference's
    * truthy-constant branch at :189 — `("partial" in text and
    * "liquidation") or "recurring" in text` means ANY text containing
    * "partial" (post-rollover/rmd) maps to partial_cash regardless of
    * "liquidation". Null/non-string -> "other".
    */
  def classifyReliusDistType(c: Column): Column = {
    val text = lower(trim(c.cast(StringType)))
    when(text.isNull, lit("other"))
      .when(text.contains("rollover") && text.contains("partial"), lit("partial_rollover"))
      .when(text.contains("rollover"), lit("rollover"))
      .when(text.contains("rmd"), lit("rmd"))
      .when(text.contains("partial") || text.contains("recurring"), lit("partial_cash"))
      .when(text.contains("liquidation") && text.contains("full"), lit("final_cash"))
      .otherwise(lit("other"))
  }

  /** F15 — full-name concat: trimmed first + " " + last, nulls -> "",
    * empty result -> NULL. reference src/cleaning/clean_relius.py:297-302.
    */
  def fullName(first: Column, last: Column): Column =
    nullif(
      trim(concat(
        coalesce(trim(first.cast(StringType)), lit("")),
        lit(" "),
        coalesce(trim(last.cast(StringType)), lit("")))),
      lit(""))

  /** F16 — year-based age: year(asof) - year(dob) as nullable double.
    * reference src/core/normalizers.py:327-334.
    */
  def computeAgeYears(dob: Column, asof: Column): Column =
    (year(to_date(asof)) - year(to_date(dob))).cast(DoubleType)

  /** F17 — first non-null integral Roth start year of (first_roth_tax_year,
    * roth_initial_contribution_year). reference src/core/normalizers.py:337-344.
    */
  def computeStartYear(firstYear: Column, initialYear: Column): Column = {
    def intIfWhole(c: Column): Column = {
      val d = c.cast(DoubleType)
      when(round(d) === d, d.cast(LongType))
    }
    coalesce(intIfWhole(firstYear), intIfWhole(initialYear))
  }

  /** F18 — combined new_tax_code: s1 alone, or s1+s2 when both (after
    * strip/upper/empty->NULL of each); NULL when s1 absent.
    * reference src/engines/match_planid.py:414-421.
    */
  def combinedTaxCode(s1: Column, s2: Column): Column = {
    def cleanCode(c: Column): Column = nullif(upper(trim(c.cast(StringType))), lit(""))
    val c1 = cleanCode(s1)
    val c2 = cleanCode(s2)
    when(c1.isNotNull, concat(c1, coalesce(c2, lit(""))))
  }

  /** F19 — split a multi-line action cell into upper-stripped tokens,
    * dropping blanks. reference src/core/normalizers.py:279-283.
    */
  def actionTokens(c: Column): Column =
    filter(
      transform(split(coalesce(c.cast(StringType), lit("")), "\\r?\\n"), x => upper(trim(x))),
      x => x =!= "")

  /** F20 — append a token to a per-row array column where `mask` holds,
    * skipping duplicates. Replaces the reference's Python row loops
    * (src/core/normalizers.py:347-366) with a codegen'd expression.
    */
  def appendWhere(arr: Column, mask: Column, token: String): Column =
    when(mask && !array_contains(coalesce(arr, array()), token),
      array_append(coalesce(arr, array()), lit(token)))
      .otherwise(arr)

  /** F21 — join a reason array with "- " bullets and newlines; empty -> NULL.
    * reference src/engines/roth_taxable_analysis.py:399-414 + joiners
    * src/config.py:516-518.
    */
  def joinReasons(arr: Column, bullet: String = "- ", joiner: String = "\n"): Column =
    when(size(arr) > 0,
      array_join(transform(arr, x => concat(lit(bullet), x)), joiner))

  /** F21 (actions variant) — plain join, empty -> NULL. */
  def joinActions(arr: Column, joiner: String = "\n"): Column =
    when(size(arr) > 0, array_join(arr, joiner))

  /** P6 — Roth-plan predicate: plan_id prefix/suffix match; null -> false.
    * reference src/core/normalizers.py:369-396.
    */
  def isRothPlan(
      c: Column,
      cfg: Config.RothTaxableConfig = Config.RothTaxable,
      caseInsensitive: Boolean = false,
      strip: Boolean = true): Column = {
    val s0 = c.cast(StringType)
    val s1 = if (strip) trim(s0) else s0
    val normalized = if (caseInsensitive) upper(s1) else s1
    val filled = coalesce(normalized, lit(""))
    val prefixes =
      if (caseInsensitive) cfg.rothPlanPrefixes.map(_.toUpperCase) else cfg.rothPlanPrefixes
    val suffixes =
      if (caseInsensitive) cfg.rothPlanSuffixes.map(_.toUpperCase) else cfg.rothPlanSuffixes
    val prefixMatch = prefixes.map(p => filled.startsWith(p)).reduceOption(_ || _).getOrElse(lit(false))
    val suffixMatch = suffixes.map(p => filled.endsWith(p)).reduceOption(_ || _).getOrElse(lit(false))
    prefixMatch || suffixMatch
  }

  /** P7 — IRA-plan predicate: uppercase prefix or substring match.
    * reference src/core/normalizers.py:263-276.
    */
  def isIraPlan(c: Column, cfg: Config.IraRolloverConfig = Config.IraRollover): Column = {
    val filled = coalesce(upper(trim(c.cast(StringType))), lit(""))
    val prefixMatch = cfg.iraPlanPrefixes.map(p => filled.startsWith(p.toUpperCase))
      .reduceOption(_ || _).getOrElse(lit(false))
    val substrMatch = cfg.iraPlanSubstrings.filter(_.nonEmpty)
      .map(s => filled.contains(s.toUpperCase))
      .reduceOption(_ || _).getOrElse(lit(false))
    prefixMatch || substrMatch
  }
}
