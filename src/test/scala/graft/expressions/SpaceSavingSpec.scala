package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The Misra-Gries guarantees that hold under ANY merge-tree order
  * (Agarwal et al., "Mergeable Summaries"): lower/upper frequency
  * bounds, bounded decrement mass, heavy-hitter completeness. The
  * summary CONTENTS are merge-order-dependent by design, so these specs
  * assert the bounds — the cross-engine-deterministic heavy-hitter
  * query is tdp_topk_sketch (CMS-prefiltered exact recount).
  */
class SpaceSavingSpec extends SparkSpec {

  private def registered = {
    GraftExtensions.registerAll(spark)
    spark
  }

  private def trueCounts(keys: Seq[Long]): Map[Long, Long] =
    keys.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("exact regime: distinct keys <= k reproduces the exact counts") {
    val s = registered
    import s.implicits._
    val keys = Seq.tabulate(500)(i => (i % 7).toLong)
    val bytes = keys.toDF("k").repartition(8)
      .agg(expr("graft_ss_agg(k, 16)")).head().getAs[Array[Byte]](0)
    val sum = SpaceSaving.decode(bytes)
    assert(sum.n == 500 && sum.errTotal == 0)
    assert(sum.items.toMap == trueCounts(keys))
  }

  test("skewed stream: bounds hold at every parallelism") {
    val s = registered
    import s.implicits._
    val rnd = new scala.util.Random(11)
    // Zipf-ish: a few heavy keys over a long uniform tail.
    val keys = Seq.fill(20000) {
      if (rnd.nextInt(10) < 6) rnd.nextInt(5).toLong // 60% mass on 5 keys
      else rnd.nextInt(2000).toLong + 100L
    }
    val truth = trueCounts(keys)
    val k = 32
    for (parts <- Seq(1, 4, 32)) {
      val bytes = keys.toDF("k").repartition(parts)
        .agg(expr(s"graft_ss_agg(k, $k)")).head().getAs[Array[Byte]](0)
      val sum = SpaceSaving.decode(bytes)
      assert(sum.n == keys.size)
      assert(sum.items.size <= k)
      // Decrement mass obeys the MG bound.
      assert(sum.errTotal <= sum.n / (k + 1),
        s"parts=$parts: errTotal ${sum.errTotal} > n/(k+1)")
      // Every reported counter brackets the true count.
      sum.items.foreach { case (key, c) =>
        val t = truth(key)
        assert(c <= t && t <= c + sum.errTotal,
          s"parts=$parts key=$key: count $c !<= true $t !<= ${c + sum.errTotal}")
      }
      // Completeness: any key with true count above the error mass MUST
      // be present — the guarantee a pre-filter relies on.
      val present = sum.items.map(_._1).toSet
      truth.foreach { case (key, t) =>
        if (t > sum.errTotal)
          assert(present.contains(key),
            s"parts=$parts: heavy key $key (true $t > err ${sum.errTotal}) missing")
      }
    }
  }

  test("serialize round trip is canonical (keys sorted)") {
    val buf = new SpaceSaving.Buffer(0L, 0L)
    Seq(5L, 1L, 5L, 9L, 1L, 5L).foreach(buf.update(_, 4))
    val bytes = SpaceSaving.serialize(buf)
    val back = SpaceSaving.deserialize(bytes)
    assert(back.n == buf.n && back.errTotal == buf.errTotal &&
      back.counts == buf.counts)
    assert(SpaceSaving.serialize(back).toSeq == bytes.toSeq)
    assert(SpaceSaving.decode(bytes).items ==
      Seq((1L, 2L), (5L, 3L), (9L, 1L)))
  }

  test("merge compress keeps at most k and charges the boundary mass") {
    val a = new SpaceSaving.Buffer(0L, 0L)
    val b = new SpaceSaving.Buffer(0L, 0L)
    (1L to 6L).foreach { key => (1L to key).foreach(_ => a.update(key, 8)) }
    (7L to 12L).foreach { key => (1L to key).foreach(_ => b.update(key, 8)) }
    val (na, nb) = (a.n, b.n)
    a.merge(b, 8)
    assert(a.n == na + nb)
    assert(a.counts.size <= 8)
    // 12 distinct counters with counts 1..12 -> 9th largest (count 4)
    // is subtracted; survivors are counts 5..12 minus 4.
    assert(a.errTotal == 4)
    assert(a.counts.toMap == (5L to 12L).map(k => k -> (k - 4L)).toMap)
  }
}
