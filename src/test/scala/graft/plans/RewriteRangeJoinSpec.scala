package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RewriteRangeJoinSpec extends SparkSpec {

  graft.expressions.GraftExtensions.registerAll(spark)

  private def frames(n: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val rows = (1 to n).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(500).toLong, i.toLong))
    val a = rows.toDF("k", "t_a", "id_a")
    val b = rows.map { case (k, t, i) => (k, (t + 13) % 500, i + 10000) }
      .toDF("k_b", "t_b", "id_b")
    (a, b)
  }

  test("declarative band condition plans as the native operator") {
    val (a, b) = frames(300)
    val df = a.join(b,
      col("k") === col("k_b") && abs(col("t_a") - col("t_b")) <= lit(20L))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastRangeJoin"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    // And the upgrade is semantics-free: equal to the un-rewritten join
    // computed by hand.
    val got = df.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val aRows = a.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val bRows = b.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = (for {
      (ka, ta, ia) <- aRows
      (kb, tb, ib) <- bRows
      if ka == kb && math.abs(ta - tb) <= 20
    } yield (ia, ib)).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("a strict < bound does not rewrite (semantics differ)") {
    val (a, b) = frames(50)
    val df = a.join(b,
      col("k") === col("k_b") && abs(col("t_a") - col("t_b")) < lit(20L))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastRangeJoin"), plan.take(2000))
  }

  test("ambiguous column names across sides block the rewrite") {
    val (a, b) = frames(50)
    val b2 = b.withColumnRenamed("id_b", "id_a") // collides with left
    val df = a.join(b2,
      col("k") === col("k_b") && abs(col("t_a") - col("t_b")) <= lit(20L))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastRangeJoin"), plan.take(2000))
  }
}
