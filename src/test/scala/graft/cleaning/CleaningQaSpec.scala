package graft.cleaning

import graft.SparkSpec

/** V7 — eager cleaner warning counters: planted bad rows must be counted
  * at the reference's pipeline positions and surfaced via the QA buffer
  * the CLI prints (reference src/cleaning/clean_matrix.py:327-335).
  */
class CleaningQaSpec extends SparkSpec {

  test("CleanMatrix eager warnings count planted bad rows") {
    import spark.implicits._
    val raw = Seq(
      // clean row
      ("300004PLAT", "123456789", 100.0, "2025-01-01", "7", "G"),
      // bad SSN (normalizes to null)
      ("300004PLAT", "BADSSN", 200.0, "2025-01-02", "4", "7"),
      // raw tax code is long, but F10 extracts at most 2 chars — the
      // length warn is structurally quiet after normalization, exactly
      // like the reference (its normalize also caps the code at 2).
      ("300004PLAT", "987654321", 300.0, "2025-01-03", "ABCDE", "4"))
      .toDF("Client Account", "Participant SSN", "Gross Amount",
        "Transaction Date", "Tax Code", "Tax Code 2")
    Cleaning.drainQaCounts() // isolate from any earlier suite activity
    CleanMatrix(raw, warnCounts = true, today = java.time.LocalDate.of(2026, 1, 1))
    val qa = Cleaning.drainQaCounts()
    assert(qa.size === 3, s"expected ssn + 2 tax-code checks, got $qa")
    assert(qa(0).message.contains("Matrix SSN normalization") && qa(0).n === 1L)
    assert(qa(1).message.contains("longer than 2 characters") && qa(1).n === 0L)
    assert(qa(2).n === 0L) // tax_code_2 all valid
  }

  test("CleanMatrix date filter runs BEFORE the keep-first dedup window") {
    import spark.implicits._
    import graft.core.Config
    // Duplicate (plan_id, ssn, txn keys) group where the FIRST-ingested
    // row is outside the range and a later duplicate is inside: the
    // reference filters before deduping, so the in-range duplicate must
    // survive (a filter-after-dedup order would drop the whole group).
    val raw = Seq(
      ("300004PLAT", "123456789", 100.0, "2024-01-05", "7", ""),
      ("300004PLAT", "123456789", 100.0, "2025-01-05", "7", ""))
      .toDF("Client Account", "Participant SSN", "Gross Amount",
        "Transaction Date", "Tax Code", "Tax Code 2")
    val cfg = Config.DateFilterConfig(
      Some(java.time.LocalDate.of(2025, 1, 1)),
      Some(java.time.LocalDate.of(2025, 12, 31)), None)
    val out = CleanMatrix(raw, dateFilter = cfg,
      today = java.time.LocalDate.of(2026, 1, 1))
    val dates = out.select("txn_date").collect().map(_.get(0).toString)
    assert(dates.toSeq == Seq("2025-01-05"),
      s"in-range duplicate must survive the pre-dedup filter, got $dates")
  }

  test("warnIf stays silent and lazy when disabled") {
    import spark.implicits._
    val raw = Seq(("300004PLAT", "BADSSN", 1.0, "2025-01-01", "7", "G"))
      .toDF("Client Account", "Participant SSN", "Gross Amount",
        "Transaction Date", "Tax Code", "Tax Code 2")
    Cleaning.drainQaCounts()
    CleanMatrix(raw, today = java.time.LocalDate.of(2026, 1, 1))
    assert(Cleaning.drainQaCounts().isEmpty)
  }
}
