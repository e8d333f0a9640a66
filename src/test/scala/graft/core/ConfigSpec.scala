package graft.core

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

/** V8 — DateFilterConfig normalization (reference
  * src/core/validators.py:55-185): month aliases, the "all" sentinel,
  * and range validation. Pure config parsing, no Spark session needed.
  */
class ConfigSpec extends AnyFunSuite {

  test("month names, numbers, and mixed aliases normalize to 1-12") {
    assert(Validators.normalizeMonthsConfig(Seq("jan", "FEB", "3", "Sept"))
      == Some(Set(1, 2, 3, 9)))
    assert(Validators.normalizeMonthsConfig(Seq("december"))
      == Some(Set(12)))
  }

  test("'all' sentinel disables month filtering; mixed with months errors") {
    assert(Validators.normalizeMonthsConfig(Seq("all")) == None)
    assert(Validators.normalizeMonthsConfig(Seq("ALL", " all ")) == None)
    assert(Validators.normalizeMonthsConfig(Nil) == None)
    intercept[IllegalArgumentException] {
      Validators.normalizeMonthsConfig(Seq("all", "jan"))
    }
  }

  test("invalid month values raise") {
    intercept[IllegalArgumentException] {
      Validators.normalizeMonthsConfig(Seq("13"))
    }
    intercept[IllegalArgumentException] {
      Validators.normalizeMonthsConfig(Seq("janx"))
    }
    // Blank entries are filtered before coercion (reference
    // validators.py:139-141): all-blank input disables the filter.
    assert(Validators.normalizeMonthsConfig(Seq("  ")) == None)
  }

  test("full config normalization: dates coerce, start<=end enforced") {
    val cfg = Validators.normalizeDateFilterConfig(
      Some("2025-01-01"), Some(" 2025-06-30 "), Seq("jan", "feb"))
    assert(cfg.dateStart == Some(LocalDate.of(2025, 1, 1)))
    assert(cfg.dateEnd == Some(LocalDate.of(2025, 6, 30)))
    assert(cfg.months == Some(Set(1, 2)))
    assert(cfg.isActive)

    intercept[IllegalArgumentException] {
      Validators.normalizeDateFilterConfig(Some("2025-06-30"), Some("2025-01-01"), Nil)
    }
    intercept[IllegalArgumentException] {
      Validators.normalizeDateFilterConfig(Some("not-a-date"), None, Nil)
    }
    assert(!Validators.normalizeDateFilterConfig(None, None, Nil).isActive)
  }
}
