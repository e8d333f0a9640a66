package graft.core

import java.time.LocalDate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Validation expression library — the Spark analogue of
  * `/root/reference/src/core/validators.py`. All validators are native
  * boolean/array `Column` expressions (the cleaners call the vectorized
  * `_series` variants, whose semantics these replicate).
  */
object Validators {

  /** V1 — cleaned-SSN validity: exactly 9 digits, not a known-bogus value,
    * area not 000/666/9xx. Null -> false.
    * reference src/core/validators.py:188-205.
    */
  def validateSsn(c: Column): Column = {
    val s = trim(c.cast(StringType))
    val area = substring(s, 1, 3)
    coalesce(
      s.rlike("^[0-9]{9}$") &&
        !s.isin("000000000", "999999999", "012345678", "123456789") &&
        !area.isin("000", "666") &&
        !area.startsWith("9"),
      lit(false))
  }

  /** V2 — amount validity (vectorized semantics,
    * reference src/core/validators.py:244-274): gross non-null, >= 0 unless
    * correction, |gross| <= 10M; when a taxable column is supplied it must be
    * non-null, >= 0, and <= gross; likewise fed_withhold <= gross.
    */
  def validateAmounts(
      gross: Column,
      taxable: Option[Column] = None,
      fedWithhold: Option[Column] = None,
      isCorrection: Option[Column] = None): Column = {
    val g = gross.cast(DoubleType)
    val correction = isCorrection.map(c => coalesce(c, lit(false))).getOrElse(lit(false))
    val base = g.isNotNull && (!(g < 0) || correction) && abs(g) <= 10000000d
    val withTaxable = taxable.map { t0 =>
      val t = t0.cast(DoubleType)
      base && t.isNotNull && t >= 0 && t <= g
    }.getOrElse(base)
    val withFed = fedWithhold.map { f0 =>
      val f = f0.cast(DoubleType)
      withTaxable && f.isNotNull && f <= g
    }.getOrElse(withTaxable)
    coalesce(withFed, lit(false))
  }

  /** V3 — date validity (vectorized semantics,
    * reference src/core/validators.py:305-329): dist date non-null, year in
    * [1990, 2050], <= today; pay date (defaults to dist) <= today+30d and
    * >= dist-30d. `today` is injected for determinism.
    */
  def validateDates(
      distDate: Column,
      payDate: Option[Column] = None,
      today: LocalDate = LocalDate.now()): Column = {
    val dist = to_date(distDate)
    val pay = payDate.map(to_date(_)).getOrElse(dist)
    val todayLit = to_date(lit(today.toString))
    coalesce(
      dist.isNotNull &&
        year(dist).between(1990, 2050) &&
        dist <= todayLit &&
        pay.isNotNull &&
        pay <= date_add(todayLit, 30) &&
        pay >= date_sub(dist, 30),
      lit(false))
  }

  /** V4 — 1099-R code validity: upper-stripped code in the valid set.
    * Null -> false. reference src/core/validators.py:332-345.
    */
  def validate1099rCode(c: Column): Column =
    coalesce(
      upper(trim(c.cast(StringType))).isin(Config.Valid1099RCodes.toSeq: _*),
      lit(false))

  /** V5 — cross-field issue tokens, in reference order
    * (src/core/validators.py:371-400): code G & taxable > 10% gross;
    * taxable > 150% gross; code 1 & age >= 59.5.
    */
  def crossValidate(
      gross: Column,
      taxable: Column,
      code: Column,
      age: Option[Column] = None): Column = {
    val g = gross.cast(DoubleType)
    val t = taxable.cast(DoubleType)
    val codeClean = upper(trim(code.cast(StringType)))
    val hasAmounts = g.isNotNull && t.isNotNull
    val tokens = Seq(
      when(hasAmounts && codeClean === "G" && t > g * 0.1, lit("cross_code_g_taxable_over_10pct")),
      when(hasAmounts && t > g * 1.5, lit("cross_taxable_exceeds_gross_150pct"))) ++
      age.map { a0 =>
        val a = a0.cast(DoubleType)
        when(codeClean === "1" && a.isNotNull && a >= 59.5, lit("cross_code1_age_over_59_5"))
      }
    filter(array(tokens: _*), x => x.isNotNull)
  }

  /** V6 — per-row issue-token array from the four boolean flags (+ cross
    * issues appended last). Only explicit `false` flags produce tokens
    * (null flags are skipped). reference src/core/validators.py:403-433.
    */
  def buildValidationIssues(
      ssnValid: Column,
      amountValid: Column,
      dateValid: Column,
      code1099rValid: Column,
      crossFieldIssues: Option[Column] = None): Column = {
    def tokenIf(flag: Column, tok: String): Column =
      when(flag === lit(false), lit(tok))
    val base = array(
      tokenIf(ssnValid, "ssn_invalid"),
      tokenIf(amountValid, "amount_invalid"),
      tokenIf(dateValid, "date_invalid"),
      tokenIf(code1099rValid, "code_1099r_invalid"))
    val combined = crossFieldIssues
      .map(c => concat(base, coalesce(c, array())))
      .getOrElse(base)
    filter(combined, x => x.isNotNull)
  }

  // --- V8: DateFilterConfig normalization (plain Scala config parsing);
  // reference src/core/validators.py:55-185.

  private val monthAliases: Map[String, Int] = Map(
    "jan" -> 1, "january" -> 1, "feb" -> 2, "february" -> 2,
    "mar" -> 3, "march" -> 3, "apr" -> 4, "april" -> 4, "may" -> 5,
    "jun" -> 6, "june" -> 6, "jul" -> 7, "july" -> 7,
    "aug" -> 8, "august" -> 8, "sep" -> 9, "sept" -> 9, "september" -> 9,
    "oct" -> 10, "october" -> 10, "nov" -> 11, "november" -> 11,
    "dec" -> 12, "december" -> 12)

  private def coerceDateValue(value: Option[String], fieldName: String): Option[LocalDate] =
    value.map(_.trim).filter(_.nonEmpty).map { v =>
      try LocalDate.parse(v)
      catch {
        case _: Exception =>
          throw new IllegalArgumentException(
            s"Invalid $fieldName: '$v'. Expected a date or YYYY-MM-DD string.")
      }
    }

  private def coerceMonthValue(value: String): Int = {
    val v = value.trim
    if (v.isEmpty)
      throw new IllegalArgumentException("Month values must be provided as names or 1-12.")
    val lower = v.toLowerCase
    val month =
      if (lower.forall(_.isDigit)) lower.toInt
      else monthAliases.getOrElse(lower,
        throw new IllegalArgumentException(
          s"Invalid month value: '$value'. Expected a month name or number."))
    if (month < 1 || month > 12)
      throw new IllegalArgumentException(
        s"Invalid month value: '$value'. Expected a month number between 1 and 12.")
    month
  }

  /** Normalize raw month config values (names/numbers/"all") to a month set;
    * None = month filtering disabled. reference src/core/validators.py:130-171.
    */
  def normalizeMonthsConfig(months: Seq[String]): Option[Set[Int]] = {
    val values = months.map(Option(_).getOrElse("")).filter(_.trim.nonEmpty)
    if (values.isEmpty) None
    else {
      val isAll = values.map(_.trim.toLowerCase == Config.DateFilterAll)
      if (isAll.forall(identity)) None
      else if (isAll.exists(identity))
        throw new IllegalArgumentException(
          "Months cannot include 'all' alongside specific month values.")
      else Some(values.map(coerceMonthValue).toSet)
    }
  }

  /** V8 — full DateFilterConfig normalization: date coercion, month parsing,
    * start <= end check. reference src/core/validators.py:174-185.
    */
  def normalizeDateFilterConfig(
      dateStart: Option[String],
      dateEnd: Option[String],
      months: Seq[String]): Config.DateFilterConfig = {
    val start = coerceDateValue(dateStart, "date_start")
    val end = coerceDateValue(dateEnd, "date_end")
    val monthSet = normalizeMonthsConfig(months)
    (start, end) match {
      case (Some(s), Some(e)) if s.isAfter(e) =>
        throw new IllegalArgumentException(
          s"Invalid date range: date_start $s is after date_end $e.")
      case _ => ()
    }
    Config.DateFilterConfig(start, end, monthSet)
  }

  /** P5 — inclusive date-range + month-set filter on `dateCol`; no-op when
    * unconfigured; drops null dates when active (compares the date part
    * only). reference src/core/normalizers.py:127-149.
    */
  def applyDateFilter(
      df: DataFrame,
      dateCol: String,
      cfg: Config.DateFilterConfig = Config.DateFilterConfig()): DataFrame = {
    if (!cfg.isActive) df
    else {
      require(df.columns.contains(dateCol),
        s"Expected date column '$dateCol' for filtering.")
      val d = to_date(col(dateCol))
      val conds = Seq(d.isNotNull) ++
        cfg.dateStart.map(s => d >= lit(s.toString).cast(DateType)) ++
        cfg.dateEnd.map(e => d <= lit(e.toString).cast(DateType)) ++
        cfg.months.map(ms => month(d).isin(ms.toSeq: _*))
      df.filter(conds.reduce(_ && _))
    }
  }
}
