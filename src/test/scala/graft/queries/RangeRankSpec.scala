package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Direct unit evidence for the shared range-partition + offset device —
  * twelve query families ride it, so its contract gets its own spec
  * rather than only transitive oracle coverage. The reference values
  * come from the bare `Window.partitionBy(...)` spelling, which is
  * acceptable IN A TEST (small planted frames): the device must be
  * value-identical to the naive window while never planning one task
  * per group.
  */
class RangeRankSpec extends SparkSpec {

  // A skewed planted frame: one mega group spanning every range
  // partition (the exact shape the device exists for), one small group,
  // one singleton. Deterministic pseudo-random order values with ties.
  private def planted = {
    import spark.implicits._
    val rows =
      (1 to 500).map(i => ("mega", (i * 7) % 97L, i.toLong)) ++
        (1 to 3).map(i => ("small", (i * 13) % 5L, (1000 + i).toLong)) ++
        Seq(("one", 0L, 2000L))
    rows.toDF("g", "v", "id")
  }

  test("rankedBy group mode equals the bare per-group window rank") {
    val df = planted
    val rk = RangeRank.rankedBy(spark, "rrspec", "rr_group_rank", df,
      Seq("g"), Seq(col("v"), col("id")), "rn")
    val got = rk.df.select("g", "id", "rn").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = df.withColumn("rn", row_number().over(
      Window.partitionBy("g").orderBy(col("v"), col("id"))))
      .collect()
      .map(r => (r.getString(0), r.getLong(2)) -> r.getInt(3).toLong).toMap
    assert(got == want)
    assert(rk.total == 504L)
  }

  test("rankedBy global mode: dense 1..n, order respected across partitions") {
    val df = planted
    val rk = RangeRank.rankedBy(spark, "rrspec", "rr_global_rank", df,
      Nil, Seq(desc("v"), col("id")), "rn")
    val rows = rk.df.select("v", "id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._3).sorted.toSeq == (1L to 504L), "ranks not dense")
    // rank order == (v desc, id asc) total order
    val byRank = rows.sortBy(_._3).map(t => (t._1, t._2)).toSeq
    val expected = rows.sortBy(t => (-t._1, t._2)).map(t => (t._1, t._2)).toSeq
    assert(byRank == expected)
  }

  test("prefixSum group mode equals the bare exclusive running sum") {
    val df = planted.withColumn("w", col("v") + 1L)
    val rk = RangeRank.prefixSum(spark, "rrspec", "rr_group_psum", df,
      Seq("g"), Seq(col("id")), col("w"), "cum")
    val got = rk.df.select("g", "id", "cum").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = df.withColumn("cum", coalesce(
      sum("w").over(Window.partitionBy("g").orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .collect()
      .map(r => (r.getString(0), r.getLong(2)) -> r.getLong(4)).toMap
    assert(got == want)
    // total = global weight sum
    val totalWant = df.agg(sum("w")).head().getLong(0)
    assert(rk.total == totalWant)
  }

  test("the rank window is per (partition id, group), never the bare group") {
    val df = planted
    val rk = RangeRank.rankedBy(spark, "rrspec", "rr_window_shape", df,
      Seq("g"), Seq(col("v"), col("id")), "rn")
    val bare = rk.df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.size == 1 &&
            w.partitionSpec.head.references.map(_.name).toSet == Set("g") =>
        w
    }
    assert(bare.isEmpty, "device degenerated to a bare per-group window")
  }
}
