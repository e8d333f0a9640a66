package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.expressions.GraftExtensions

class RewriteDotProductSpec extends SparkSpec {

  private val hofDot =
    "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE))," +
      " CAST(0 AS DOUBLE), (acc, x) -> acc + x)"

  test("HOF dot-product pattern rewrites to the native kernel") {
    val s = spark
    GraftExtensions.registerAll(s)
    // Data-dependent arrays (literal arrays would constant-fold the whole
    // expression away before the plan can be inspected).
    val df = s.range(2).select(
      array(col("id").cast("float"), lit(2.0f)).as("a"),
      array(lit(3.0f), col("id").cast("float")).as("b"))
      .select(expr(hofDot).as("d"))
    assert(df.queryExecution.optimizedPlan.toString.contains("graft_dot"),
      s"not rewritten:\n${df.queryExecution.optimizedPlan}")
    // id=0 -> [0,2]·[3,0] = 0; id=1 -> [1,2]·[3,1] = 5
    assert(df.collect().map(_.getDouble(0)).sorted.toSeq == Seq(0.0, 5.0))
  }

  test("rewritten plan is bit-identical to the interpreted fold") {
    val s = spark
    GraftExtensions.registerAll(s)
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 100).map { i =>
      (Array.fill(64)((rnd.nextFloat() - 0.5f) * i),
        Array.fill(64)((rnd.nextFloat() - 0.5f) * (101 - i)))
    }
    val df = rows.toDF("a", "b")
    val native = df.select(expr(hofDot)).collect().map(_.getDouble(0))
    // Evaluate the same fold with the rewrite disabled for this plan only.
    val prev = s.experimental.extraOptimizations
    s.experimental.extraOptimizations =
      prev.filterNot(_ == RewriteDotProduct)
    val interpreted =
      try df.select(expr(hofDot)).collect().map(_.getDouble(0))
      finally s.experimental.extraOptimizations = prev
    native.zip(interpreted).foreach { case (n, h) =>
      assert(java.lang.Double.doubleToLongBits(n) ==
        java.lang.Double.doubleToLongBits(h))
    }
  }

  test("non-matching folds are left alone") {
    val s = spark
    GraftExtensions.registerAll(s)
    import s.implicits._
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    // Sum (not product) fold, and a product fold with a non-zero seed:
    // neither may be rewritten.
    val sumFold = df.select(expr(
      "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) + CAST(y AS DOUBLE))," +
        " CAST(0 AS DOUBLE), (acc, x) -> acc + x)").as("d"))
    assert(!sumFold.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    assert(sumFold.head.getDouble(0) == 10.0)
    val seeded = df.select(expr(
      "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE))," +
        " CAST(1 AS DOUBLE), (acc, x) -> acc + x)").as("d"))
    assert(!seeded.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    assert(seeded.head.getDouble(0) == 12.0)
  }

  test("null and unequal-length semantics survive the rewrite") {
    val s = spark
    GraftExtensions.registerAll(s)
    val out = s.sql(
      "SELECT " +
        "aggregate(zip_with(array(1.0D, 2.0D), array(3.0D), (x, y) -> x * y)," +
        " CAST(0 AS DOUBLE), (acc, x) -> acc + x) AS unequal, " +
        "aggregate(zip_with(array(1.0D, NULL), array(3.0D, 4.0D), (x, y) -> x * y)," +
        " CAST(0 AS DOUBLE), (acc, x) -> acc + x) AS with_null").collect()(0)
    assert(out.isNullAt(0))
    assert(out.isNullAt(1))
  }
}
