package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BottomKSpec extends SparkSpec {

  private def registered = {
    GraftExtensions.registerAll(spark)
    spark
  }

  test("graft_bottomk equals the sorted-distinct prefix") {
    val s = registered
    import s.implicits._
    val rnd = new scala.util.Random(11)
    // Heavy duplication so dedup is actually exercised.
    val rows = (1 to 5000).map(i => (i % 7, rnd.nextInt(300).toLong))
    val got = rows.toDF("g", "v")
      .groupBy("g")
      .agg(expr("graft_bottomk(v, 16)").as("sk"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val want = rows.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(_._2).distinct.sorted.take(16)
    }
    assert(got.keySet == want.keySet)
    want.foreach { case (g, exp) =>
      assert(got(g) == exp, s"group $g: ${got(g)} != $exp")
    }
  }

  test("partial aggregation + shuffle merge matches single-partition result") {
    val s = registered
    import s.implicits._
    val rnd = new scala.util.Random(12)
    val rows = (1 to 20000).map(i => (i % 3, rnd.nextLong() & 0x7fffffffL))
    def run(parts: Int) = rows.toDF("g", "v").repartition(parts)
      .groupBy("g").agg(expr("graft_bottomk(v, 32)").as("sk"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(run(16) == run(1))
  }

  test("nulls are ignored and an all-null group yields an empty sketch") {
    val s = registered
    import s.implicits._
    val rows: Seq[(Int, Option[Long])] =
      Seq((1, Some(5L)), (1, None), (2, None))
    val got = rows.toDF("g", "v")
      .groupBy("g").agg(expr("graft_bottomk(v, 4)").as("sk"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(got(1) == Seq(5L))
    assert(got(2) == Seq.empty[Long])
  }
}
