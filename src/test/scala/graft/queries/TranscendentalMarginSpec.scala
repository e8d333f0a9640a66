package graft.queries

import graft.SparkSpec

/** The executable form of SCALING.md's "transcendental boundary" remedy:
  * every ln()-floored oracle family assumes JVM Math.log and DuckDB's
  * libm agree on the same double input — safe as long as no REAL corpus
  * input lands within the last-ulp disagreement window of an integer
  * micro-unit boundary. [[TdpQueries.lnBoundaryMargins]] re-derives each
  * family's pre-floor doubles over the actual sf0.01 corpus; this spec
  * asserts every family clears the boundary by > 1e-9 (the flagged
  * danger zone), so a data change that drifts an input onto a boundary
  * fails HERE, loudly, instead of as an unexplained cross-engine hash
  * mismatch in the correctness gate.
  */
class TranscendentalMarginSpec extends SparkSpec {

  test("sf0.01: every ln-floored input clears its micro-unit boundary by 1e-9") {
    val dir = "/root/testdata/sf0.01"
    val rows = TdpQueries.lnBoundaryMargins(spark, dir).collect()
    val families = rows.map(_.getAs[String]("family")).toSet
    assert(families == Set(
      "bigram_logprob", "heldout_perplexity", "kneser_ney",
      "token_entropy", "collocations_pmi", "zipf_rank", "zipf_freq",
      "unigram_lm", "unigram_prune", "importance_resample",
      "mutual_info_pmi", "session_entropy", "bm25", "cond_entropy"),
      families)
    rows.foreach { r =>
      val fam = r.getAs[String]("family")
      val n = r.getAs[Long]("n_inputs")
      val m = r.getAs[Double]("min_margin")
      assert(n > 0L, s"$fam: empty input set — the audit derivation drifted")
      assert(m > 1e-9,
        f"$fam: an input sits $m%.3e from a micro-unit boundary " +
          f"(over $n inputs) — inside the cross-engine floor danger zone")
    }
  }
}
