package graft.queries

import graft.SparkSpec

/** SCALING.md coverage lint — the documentation contract made
  * machine-checked, the WindowLintSpec discipline applied to prose: every
  * registered query name must appear in SCALING.md (strict word-boundary
  * match, so `tdp_ann_beam` inside `tdp_ann_beam_width` does not count).
  * Nothing is whitelisted. The r12 lesson this encodes: `ea_fuzzy_match`
  * shipped a corpus-sized broadcast build for FOUR rounds precisely
  * because it was the one query with no written scale argument — and
  * `q49_ignore_nulls` showed the gap was systemic, not a one-off. A new
  * query now fails CI until its 100 TB bound is written down.
  */
class ScalingCoverageSpec extends SparkSpec {

  private def scalingText: String = {
    val candidates = Seq("SCALING.md", "/root/repo/SCALING.md")
      .map(java.nio.file.Paths.get(_))
    val p = candidates.find(java.nio.file.Files.exists(_))
      .getOrElse(fail(s"SCALING.md not found at ${candidates.mkString(", ")}"))
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
  }

  private def mentions(text: String, name: String): Boolean =
    java.util.regex.Pattern
      .compile("(?<![A-Za-z0-9_])" + java.util.regex.Pattern.quote(name) +
        "(?![A-Za-z0-9_])")
      .matcher(text).find()

  test("lint control: word-boundary matching, not substring matching") {
    val text = "covers tdp_ann_beam_width only"
    assert(mentions(text, "tdp_ann_beam_width"))
    assert(!mentions(text, "tdp_ann_beam"),
      "control: a prefix of a longer name must NOT count as covered")
  }

  test("every registered query has a SCALING.md entry") {
    val text = scalingText
    val missing = Registry.all.map(_.name).filterNot(mentions(text, _)).sorted
    assert(missing.isEmpty,
      s"queries with no SCALING.md scale argument: ${missing.mkString(", ")}")
    // And the control direction: an unregistered name is not satisfied
    // by accident.
    assert(!mentions(text, "tdp_this_query_does_not_exist"))
  }
}
