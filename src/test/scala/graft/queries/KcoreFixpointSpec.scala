package graft.queries

import graft.SparkSpec

/** Evidence for tdp_kcore's fixed 6-round choice: the peel trace on the
  * real sf0.01 near-dup graph must be STATIONARY by round 5 — i.e. the
  * round-5 and round-6 censuses agree — so six rounds sit past the
  * fixpoint (peel depth <= 5) rather than truncating a still-shrinking
  * graph. Pendant depth on an LSH clone-family graph is small by
  * construction (stars have depth 1); this pins the claim to data.
  */
class KcoreFixpointSpec extends SparkSpec {

  test("sf0.01 near-dup graph: 2-core peeling is stationary by round 5") {
    val dir = "/root/testdata/sf0.01"
    val trace = Registry.queries("tdp_kcore")(spark, dir).collect()
      .map(r => r.getAs[Long]("rnd") ->
        (r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges"))).toMap
    assert(trace(0L)._1 > 0L, "empty near-dup graph — fixture drifted")
    assert(trace(5L) == trace(6L),
      s"2-core peel still shrinking between rounds 5 and 6: $trace")
  }
}
