package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HllSpec extends SparkSpec {

  private def registered = {
    GraftExtensions.registerAll(spark)
    spark
  }

  private def sketchOf(keys: Seq[Long], parts: Int): Array[Byte] = {
    val s = registered
    import s.implicits._
    keys.toDF("k").repartition(parts)
      .agg(expr("graft_hll_agg(k)").as("sk"))
      .head().getAs[Array[Byte]](0)
  }

  test("registers equal the brute-force max-rho per bucket") {
    val rnd = new scala.util.Random(11)
    val keys = (1 to 5000).map(_ => rnd.nextLong().abs % 1000000007L)
    val sk = sketchOf(keys, 8)
    assert(sk.length == Hll.M)
    val expected = new Array[Byte](Hll.M)
    keys.foreach { k =>
      val b = Hll.bucket(k)
      val r = Hll.rho(k).toByte
      if (r > expected(b)) expected(b) = r
    }
    assert(sk.toSeq == expected.toSeq)
  }

  test("merge is parallelism-invariant and duplicate-insensitive") {
    val rnd = new scala.util.Random(29)
    val keys = (1 to 20000).map(_ => rnd.nextInt(3000).toLong)
    // Element-wise max is commutative AND idempotent: any partitioning,
    // and even feeding every key twice, yields the identical sketch.
    val one = sketchOf(keys, 1).toSeq
    assert(sketchOf(keys, 16).toSeq == one)
    assert(sketchOf(keys ++ keys, 16).toSeq == one)
  }

  test("estimate lands within the expected error band") {
    // m=256 => typical relative error ~1.04/sqrt(256) = 6.5%; assert a
    // generous 20% band so the test guards the formula, not the luck of
    // one seed. Keys spread over the polyhash range for hash uniformity.
    val rnd = new scala.util.Random(43)
    val distinct = (1 to 10000)
      .map(_ => rnd.nextLong().abs % 1000000007L).distinct
    val est = Hll.estimate(sketchOf(distinct, 8))
    val n = distinct.size.toLong
    assert(math.abs(est - n).toDouble / n < 0.20,
      s"estimate $est vs true $n out of band")
  }

  test("rho/bucket pin the cross-engine contract") {
    // The DuckDB oracle rebuilds registers from key%256 and trailing
    // zeros of key//256 (+1, capped at 23). Pin those semantics.
    assert(Hll.bucket(258L) == 2)
    assert(Hll.rho(255L) == Hll.MaxRho) // v = 0 -> cap
    assert(Hll.rho(256L) == 1) // v = 1 -> ntz 0
    assert(Hll.rho(1024L) == 3) // v = 4 -> ntz 2
    // estimate is pure integer arithmetic: empty sketch -> alpha*m²/m
    val empty = new Array[Byte](Hll.M)
    assert(Hll.estimate(empty) ==
      Hll.AlphaE7 * Hll.M * Hll.M / (Hll.M.toLong * 10000000L))
  }

  test("graft_hll_estimate composes with the aggregate per group") {
    val s = registered
    import s.implicits._
    // Two groups with disjoint known key sets: the nested
    // estimate(agg(key)) per group must equal the estimate computed on
    // each group's driver-built sketch.
    val rows = (1 to 4000).map { i =>
      val g = if (i % 2 == 0) "a" else "b"
      (g, (i * 2654435761L).abs % 1000000007L)
    }
    val got = rows.toDF("g", "k").repartition(8)
      .groupBy("g")
      .agg(expr("graft_hll_estimate(graft_hll_agg(k))").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (g, grp) =>
      val regs = new Array[Byte](Hll.M)
      grp.map(_._2).foreach { k =>
        val b = Hll.bucket(k)
        val r = Hll.rho(k).toByte
        if (r > regs(b)) regs(b) = r
      }
      assert(got(g) == Hll.estimate(regs), s"group $g")
    }
  }

  test("nulls are ignored in the build") {
    val s = registered
    import s.implicits._
    val rows: Seq[Option[Long]] = Seq(Some(5L), None, Some(7L), None)
    val sk = rows.toDF("k")
      .agg(expr("graft_hll_agg(k)").as("sk"))
      .head().getAs[Array[Byte]](0)
    assert(sk.count(_ != 0) == 2)
  }
}
