package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Evidence for tdp_markov_stationary's fixed 6-round choice: run the
  * SAME integer power iteration for 6 and for 7 rounds on the real
  * sf0.01 event chain and publish the largest per-type micro-unit
  * drift. The documented per-round drift bound is alphabet² micro-units
  * (truncating per-term division, no renormalization); the assertion
  * uses 100 micro — 4 orders of magnitude under the 10^6 mass scale —
  * so a chain that is genuinely still mixing fails loudly.
  */
class MarkovFixpointSpec extends SparkSpec {

  test("sf0.01 event chain: round 7 moves no type by more than 100 micro") {
    val dir = "/root/testdata/sf0.01"
    val r6 = TdpQueries.markovStationary(spark, dir, rounds = 6)
      .withColumnRenamed("stationary_micro", "x6")
    val r7 = TdpQueries.markovStationary(spark, dir, rounds = 7)
      .withColumnRenamed("stationary_micro", "x7")
    val joined = r6.join(r7, Seq("event_type"), "full_outer")
      .select(col("event_type"),
        abs(coalesce(col("x6"), lit(0L))
          - coalesce(col("x7"), lit(0L))).as("drift"))
    val rows = joined.collect()
    assert(rows.nonEmpty, "empty event chain — fixture drifted")
    val maxDrift = rows.map(_.getAs[Long]("drift")).max
    assert(maxDrift <= 100L,
      s"stationary mass still moving by $maxDrift micro between rounds " +
        "6 and 7 — the fixed 6-round choice no longer sits past the mix")
  }
}
