package graft.cleaning

import org.apache.spark.sql.functions.col

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

  test("CleanMatrix date filter order is result-equivalent around dedup") {
    import spark.implicits._
    import graft.core.{Config, Validators => V}
    // txn_date is one of the dedup match keys, so every duplicate group
    // shares a single txn_date and the date filter keeps or drops a group
    // UNIFORMLY — filter-before-dedup (the reference's order, which
    // CleanMatrix implements) and filter-after-dedup (what the
    // p5_date_filter oracle computes over the cleaned frame) are provably
    // the same result. Pin that equivalence on planted duplicates, one
    // group in range and one out.
    val raw = Seq(
      ("300004PLAT", "123456789", 100.0, "2024-01-05", "7", ""),
      ("300004PLAT", "123456789", 100.0, "2024-01-05", "7", ""),
      ("300004PLAT", "987654321", 200.0, "2025-02-05", "7", ""),
      ("300004PLAT", "987654321", 200.0, "2025-02-05", "4", ""))
      .toDF("Client Account", "Participant SSN", "Gross Amount",
        "Transaction Date", "Tax Code", "Tax Code 2")
    val cfg = Config.DateFilterConfig(
      Some(java.time.LocalDate.of(2025, 1, 1)),
      Some(java.time.LocalDate.of(2025, 12, 31)), None)
    val today = java.time.LocalDate.of(2026, 1, 1)
    val inPipeline = CleanMatrix(raw, dateFilter = cfg, today = today)
      .select("ssn", "txn_date", "tax_code_1").collect().map(_.toSeq).toSet
    val postClean = V.applyDateFilter(
        CleanMatrix(raw, today = today), "txn_date", cfg)
      .select("ssn", "txn_date", "tax_code_1").collect().map(_.toSeq).toSet
    assert(inPipeline == postClean)
    assert(inPipeline.map(_.head) == Set("987654321"),
      s"only the in-range group's keep-first row survives, got $inPipeline")
  }

  test("heavyTail commutes with dropAndDedup on both cleaners (r14 ADVICE)") {
    import spark.implicits._
    // The bench path runs the heavy row-local tail AFTER the null-key
    // drop + keep-first dedup; the CLI QA path keeps the reference order
    // (tail first). Equivalence relies on the tail never touching a
    // match-key column — assert it on planted duplicates whose
    // tail-touched columns DIFFER inside a dup group, so a future
    // normalizer added to heavyTail that modifies a key (or a key-
    // feeding normalization demoted into the tail) fails here instead
    // of silently forking the two paths.
    val today = java.time.LocalDate.of(2026, 1, 1)
    val rawM = Seq(
      // dup group: same match keys, different tail columns (tax codes)
      ("300004PLAT", "123456789", 100.0, "2025-01-01", "7", "G"),
      ("300004PLAT", "123456789", 100.0, "2025-01-01", "4", ""),
      ("300004PLAT", "987654321", 200.0, "2025-01-02", "ABCDE", "4"),
      // null-key row: dropped either way
      ("300004PLAT", null, 300.0, "2025-01-03", "7", ""))
      .toDF("Client Account", "Participant SSN", "Gross Amount",
        "Transaction Date", "Tax Code", "Tax Code 2")
    val mBench = CleanMatrix(rawM, today = today)
    val mRef = CleanMatrix(rawM, warnCounts = true, today = today)
    Cleaning.drainQaCounts()
    assert(mBench.columns.sorted.sameElements(mRef.columns.sorted))
    val mCols = mBench.columns.sorted.map(col)
    assert(mBench.select(mCols: _*).collect().map(_.toSeq).toSet ===
      mRef.select(mCols: _*).collect().map(_.toSeq).toSet)
    val rawR = Seq(
      ("300004PLAT", "123456789", "Ann", "Lee", "CA", 50.0,
        "2025-01-01", "7", 2025L, "Termination"),
      ("300004PLAT", "123456789", "ann", "LEE", "ny", 50.0,
        "2025-01-01", "4x", 2025L, "Hardship"),
      ("300004PLAT", "987654321", "Bo", "Kim", "WA", 60.0,
        "2025-01-02", "1", 2025L, "RMD"))
      .toDF("PLANID_1", "SSNUM_1", "FIRSTNAM", "LASTNAM", "STATEADDR",
        "GROSSDISTRAMT", "EXPORTEDDATE", "DISTR1CD", "TAXYR", "DISTRNAM")
    val rBench = CleanRelius(rawR, today = today)
    val rRef = CleanRelius(rawR, warnCounts = true, today = today)
    Cleaning.drainQaCounts()
    assert(rBench.columns.sorted.sameElements(rRef.columns.sorted))
    val rCols = rBench.columns.sorted.map(col)
    assert(rBench.select(rCols: _*).collect().map(_.toSeq).toSet ===
      rRef.select(rCols: _*).collect().map(_.toSeq).toSet)
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
