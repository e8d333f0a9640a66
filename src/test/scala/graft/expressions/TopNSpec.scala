package graft.expressions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopNSpec extends SparkSpec {

  private def registered = {
    GraftExtensions.registerAll(spark)
    spark
  }

  test("grouped top-n equals the row_number window formulation") {
    val s = registered
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 5000).map(i =>
      (s"g${rnd.nextInt(7)}", rnd.nextInt(100).toLong, i.toLong))
    val df = rows.toDF("g", "score", "id")
    val viaAgg = df.groupBy("g")
      .agg(call_function("graft_topn", col("score"), col("id"), lit(3))
        .as("top"))
      .select(col("g"), expr(
        "array_join(transform(top, x -> concat(x.id, ':', x.score)), '|')")
        .as("top_s"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    val w = Window.partitionBy("g").orderBy(desc("score"), col("id"))
    val viaWindow = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .groupBy("g")
      .agg(expr("array_join(transform(" +
        "array_sort(collect_list(struct(rk, id, score)))," +
        " x -> concat(x.id, ':', x.score)), '|')").as("top_s"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(viaAgg == viaWindow)
  }

  test("partial aggregation + merge matches single-partition result") {
    val s = registered
    import s.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (1 to 20000).map(i =>
      (rnd.nextInt(5), rnd.nextInt(50).toLong, i.toLong))
    def top(parts: Int) =
      rows.toDF("g", "score", "id").repartition(parts)
        .groupBy("g")
        .agg(call_function("graft_topn", col("score"), col("id"), lit(4))
          .as("top"))
        .select(col("g"), expr(
          "array_join(transform(top, x -> concat(x.id, ':', x.score)), '|')"))
        .collect().map(r => (r.getInt(0), r.getString(1))).toMap
    // Heap merge must be a pure set function: identical at any parallelism
    // (the deterministic (score DESC, id ASC) order resolves all ties).
    assert(top(32) == top(1))
  }

  test("Long.MinValue score ranks worst, not best (negation overflow)") {
    val s = registered
    import s.implicits._
    val df = Seq(
      ("a", Long.MinValue, 1L), ("a", 0L, 2L), ("a", Long.MaxValue, 3L),
      ("a", -5L, 4L)).toDF("g", "score", "id")
    val got = df.groupBy("g")
      .agg(call_function("graft_topn", col("score"), col("id"), lit(3))
        .as("top"))
      .select(expr("array_join(transform(top, x -> x.id), '|')"))
      .head().getString(0)
    // MaxValue first, MinValue evicted (a negating comparator would
    // instead rank MinValue as the best element).
    assert(got == "3|2|4")
  }

  test("groups smaller than n return all members, ranked") {
    val s = registered
    import s.implicits._
    val df = Seq(("a", 10L, 1L), ("a", 20L, 2L)).toDF("g", "score", "id")
    val got = df.groupBy("g")
      .agg(call_function("graft_topn", col("score"), col("id"), lit(5))
        .as("top"))
      .select(expr(
        "array_join(transform(top, x -> concat(x.id, ':', x.score)), '|')"))
      .head().getString(0)
    assert(got == "2:20|1:10")
  }
}
