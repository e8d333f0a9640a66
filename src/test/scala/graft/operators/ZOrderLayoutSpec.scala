package graft.operators

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderLayoutSpec extends SparkSpec {

  /** Reference Morton interleave for the brute-force check. */
  private def morton(x: Int, y: Int, bits: Int): Int =
    (0 until bits).map { i =>
      (((x >> i) & 1) << (2 * i)) | (((y >> i) & 1) << (2 * i + 1))
    }.sum

  test("zvalue matches the brute-force bit interleave") {
    val s = spark
    import s.implicits._
    val pts = for (x <- 0 until 16; y <- 0 until 16) yield (x, y)
    val got = pts.toDF("x", "y")
      .withColumn("z", ZOrderLayout.zvalue(col("x"), col("y"), 4))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getInt(2))).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == morton(x, y, 4), s"($x,$y)")
    }
    // The 4-bit curve is a bijection on the 16x16 grid.
    assert(got.values.toSet == (0 until 256).toSet)
  }

  test("curve cells are compact boxes: span bound on both dimensions") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5)
    val rows = (1 to 5000).map(_ => (rnd.nextInt(256), rnd.nextInt(256)))
    val spans = rows.toDF("x", "y")
      .withColumn("z", ZOrderLayout.zvalue(col("x"), col("y"), 8))
      .groupBy(expr("CAST(z div 256 AS INT)").as("cell"))
      .agg(max("x") - min("x") as "xs", max("y") - min("y") as "ys")
      .collect()
    assert(spans.nonEmpty)
    // A 256-code cell fixes the high 4 bits of each dimension: every
    // bounding box is at most 16x16 — the file-skipping guarantee.
    spans.foreach { r =>
      assert(r.getAs[Int]("xs") <= 15 && r.getAs[Int]("ys") <= 15,
        s"cell ${r.get(0)} box ${r.getAs[Int]("xs")}x${r.getAs[Int]("ys")}")
    }
  }

  test("layout is one range exchange on zval + local sort, rows preserved") {
    val s = spark
    import s.implicits._
    val df = (1 to 1000).map(i => (i % 64, (i * 7) % 64)).toDF("x", "y")
    val out = ZOrderLayout.layout(df, col("x"), col("y"), 6, 4)
    // AQE wraps the plan in an AdaptiveSparkPlanExec leaf; assert on its
    // input plan (the PlanSpec pattern).
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val plan = out.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case p: SparkPlan => p
    }
    val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.length == 1, "layout must cost exactly one exchange")
    exchanges.head.outputPartitioning match {
      case r: RangePartitioning =>
        assert(r.ordering.map(_.child.sql).mkString == "zval")
      case p => fail(s"expected RangePartitioning on zval, got $p")
    }
    assert(out.count() == 1000)
    // Partition-local ordering by zval (the write-order contract).
    val perPart = out.select(spark_partition_id().as("p"), col("zval"))
      .collect().groupBy(_.getInt(0)).values
    perPart.foreach { rows =>
      val zs = rows.map(_.getInt(1)).toSeq
      assert(zs == zs.sorted)
    }
  }
}
