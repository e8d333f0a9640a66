package graft.core

import java.time.LocalDate

/** Central configuration for the reconciliation engine.
  *
  * Mirrors the reference's single-source-of-truth config
  * (reference: src/config.py:169-541): column maps, core columns, match
  * keys, plan sets, and the per-engine rule parameters. All business
  * constants used by cleaners/engines flow from here.
  */
object Config {

  // --- Column name mapping (raw -> canonical); reference src/config.py:240-296
  val ReliusColumnMap: Seq[(String, String)] = Seq(
    "PLANID_1"      -> "plan_id",
    "SSNUM_1"       -> "ssn",
    "FIRSTNAM"      -> "first_name",
    "LASTNAM"       -> "last_name",
    "STATEADDR"     -> "state",
    "GROSSDISTRAMT" -> "gross_amt",
    "EXPORTEDDATE"  -> "exported_date",
    "DISTR1CD"      -> "dist_code_1",
    "TAXYR"         -> "tax_year",
    "DISTRNAM"      -> "dist_name",
  )

  val ReliusRothBasisColumnMap: Seq[(String, String)] = Seq(
    "PLANID"           -> "plan_id",
    "SSNUM"            -> "ssn",
    "FIRSTNAM"         -> "first_name",
    "LASTNAM"          -> "last_name",
    "FIRSTTAXYEARROTH" -> "first_roth_tax_year",
    "Total"            -> "roth_basis_amt",
  )

  val ReliusDemoColumnMap: Seq[(String, String)] = Seq(
    "PLANID"    -> "plan_id",
    "SSNUM"     -> "ssn",
    "FIRSTNAM"  -> "first_name",
    "LASTNAM"   -> "last_name",
    "BIRTHDATE" -> "dob",
    "TERM_DATE" -> "term_date",
  )

  val MatrixColumnMap: Seq[(String, String)] = Seq(
    "Matrix Account"                  -> "matrix_account",
    "Client Account"                  -> "plan_id",
    "Participant SSN"                 -> "ssn",
    "Participant Name"                -> "participant_name",
    "Participant State"               -> "state",
    "Gross Amount"                    -> "gross_amt",
    "Transaction Date"                -> "txn_date",
    "Transaction Type"                -> "txn_method",
    "Tax Code"                        -> "tax_code_1",
    "Tax Code 2"                      -> "tax_code_2",
    "Tax Form"                        -> "tax_form",
    "Federal Taxing Method"           -> "federal_taxing_method",
    "Distribution Type"               -> "dist_type",
    "Transaction Id"                  -> "transaction_id",
    "Fed Taxable Amount"              -> "fed_taxable_amt",
    "Roth Initial Contribution Year"  -> "roth_initial_contribution_year",
  )

  // --- Core columns & match keys; reference src/config.py:305-368
  val ReliusCoreColumns: Seq[String] = Seq(
    "plan_id", "ssn", "first_name", "last_name", "state", "gross_amt",
    "exported_date", "tax_year", "dist_code_1", "dist_name")

  val ReliusRothBasisCoreColumns: Seq[String] = Seq(
    "plan_id", "ssn", "first_name", "last_name", "first_roth_tax_year",
    "roth_basis_amt")

  val MatrixCoreColumns: Seq[String] = Seq(
    "plan_id", "ssn", "participant_name", "state", "gross_amt",
    "fed_taxable_amt", "txn_date", "txn_method", "tax_code_1", "tax_code_2",
    "tax_form", "federal_taxing_method", "dist_type",
    "roth_initial_contribution_year", "transaction_id", "matrix_account")

  val ReliusMatchKeys: Seq[String] =
    Seq("plan_id", "ssn", "gross_amt", "exported_date", "tax_year")

  val MatrixMatchKeys: Seq[String] =
    Seq("plan_id", "ssn", "gross_amt", "txn_date")

  /** Join keys for Engine A reconciliation (reference src/engines/match_planid.py:321-336). */
  val MatchKeys: Seq[String] = Seq("plan_id", "ssn", "gross_amt")

  // --- Matching configuration; reference src/config.py:169-195
  final case class MatchingConfig(
      amountToleranceCents: Int = 100, // declared but never used by the
                                       // reference (matching is exact on
                                       // gross_amt) — kept for fidelity
      maxDateLagDays: Int = 10,
  )
  val Matching: MatchingConfig = MatchingConfig()

  // --- Date filter configuration; reference src/config.py:203-226
  /** months: None = disabled ("all" sentinel already normalized); validated by
    * Validators.normalizeDateFilterConfig.
    */
  final case class DateFilterConfig(
      dateStart: Option[LocalDate] = None,
      dateEnd: Option[LocalDate] = None,
      months: Option[Set[Int]] = None,
  ) {
    def isActive: Boolean = dateStart.nonEmpty || dateEnd.nonEmpty || months.nonEmpty
  }
  val DateFilterAll = "all"

  // --- Business rules; reference src/config.py:375-382
  val InheritedPlanIds: Set[String] = Set("300004PLAT", "300004MBD", "300004MBDII")
  val DefaultReconciliationPlanIds: Set[String] = InheritedPlanIds

  // --- Match status vocabulary; reference src/config.py:430-446
  object MatchStatus {
    val NoAction = "match_no_action"
    val NeedsCorrection = "match_needs_correction"
    val NeedsReview = "match_needs_review"
    val DateOutOfRange = "date_out_of_range"
    val UnmatchedRelius = "unmatched_relius"
    val UnmatchedMatrix = "unmatched_matrix"
    val ExcludedAgeEngine = "excluded_from_age_engine_rollover_or_inherited"
    val InsufficientData = "age_rule_insufficient_data"
  }

  // --- Engine B (age tax-code) config; reference src/config.py:450-470
  final case class AgeTaxCodeConfig(
      normalAgeYears: Double = 59.5,
      termRuleAgeYears: Double = 55.0,
      normalDistCode: String = "7",
      under55Code: String = "1",
      age55PlusCode: String = "2",
      excludedCodes: Seq[String] =
        Seq("G", "H", "11", "13", "15", "16", "17", "18", "19", "33", "4"),
  )
  val AgeTaxCode: AgeTaxCodeConfig = AgeTaxCodeConfig()

  // --- Engine C (Roth taxable) config; reference src/config.py:473-494
  final case class RothTaxableConfig(
      qualifiedAgeYears: Double = 59.5,
      qualifiedYearsSinceFirst: Int = 5,
      basisCoverageYear: Int = 2025,
      taxableProximityPct: Double = 0.15,
      rothPlanPrefixes: Seq[String] = Seq("300005"),
      rothPlanSuffixes: Seq[String] = Seq("R"),
      validYearMin: Int = 1900,
      validYearMax: Int = 2100,
      statusNoAction: String = MatchStatus.NoAction,
      statusNeedsCorrection: String = MatchStatus.NeedsCorrection,
      statusNeedsReview: String = MatchStatus.NeedsReview,
      actionUpdate: String = "UPDATE_1099",
      actionInvestigate: String = "INVESTIGATE",
  )
  val RothTaxable: RothTaxableConfig = RothTaxableConfig()

  // --- Engine C tax-code config; reference src/config.py:497-523
  final case class RothTaxCodeConfig(
      excludedCodesTaxcode: Seq[String] =
        Seq("11", "13", "15", "16", "17", "18", "19", "33"),
      statusExcluded: String = MatchStatus.ExcludedAgeEngine,
      actionUpdate: String = "UPDATE_1099",
      actionInvestigate: String = "INVESTIGATE",
      actionJoiner: String = "\n",
      reasonJoiner: String = "\n",
      reasonBullet: String = "- ",
      rothCode: String = "B",
      rothRolloverCode: String = "H",
      rolloverCode: String = "G",
      deathCode: String = "4",
  )
  val RothTaxCode: RothTaxCodeConfig = RothTaxCodeConfig()

  // --- Engine D (IRA rollover) config; reference src/config.py:525-532
  final case class IraRolloverConfig(
      iraPlanPrefixes: Seq[String] = Seq("300001", "300005"),
      iraPlanSubstrings: Seq[String] = Seq("IRA"),
  )
  val IraRollover: IraRolloverConfig = IraRolloverConfig()

  // --- Cleaner blocklists; reference src/cleaning/clean_matrix.py:222-234
  // (filled in CleanMatrix — see that file for citation)

  /** Valid 1099-R distribution codes; reference src/core/validators.py:41-53. */
  val Valid1099RCodes: Set[String] =
    Set("1", "2", "4", "7", "8", "B", "G", "H", "L", "P", "Q")

  val ActionUpdate = "UPDATE_1099"
  val ActionInvestigate = "INVESTIGATE"
}
