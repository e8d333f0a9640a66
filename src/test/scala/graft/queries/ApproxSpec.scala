package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Approximate-aggregate surface (HLL++ distinct counts, quantile
  * sketches). These are sketch-based and engine-specific by construction,
  * so they cannot hash-match a DuckDB oracle — the contract tested here is
  * the documented error bound against the EXACT answer computed by this
  * engine itself.
  */
class ApproxSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("approx_count_distinct lands within the configured error of exact") {
    val li = Registry.table(spark, dir, "lineitem")
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx")).head
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    // rsd 0.02 -> generous 3-sigma band
    assert(math.abs(approx - exact) / exact < 0.06,
      s"approx=$approx exact=$exact")
  }

  test("approx_percentile brackets the exact nearest-rank percentile") {
    val o = Registry.table(spark, dir, "orders")
      .select(floor(col("o_totalprice")).cast("long").as("fp"))
    val exactP50 = {
      val sorted = o.orderBy("fp").collect().map(_.getLong(0))
      sorted((sorted.length * 50 + 99) / 100 - 1)
    }
    val approxP50 = o.agg(expr("approx_percentile(fp, 0.5, 1000)")).head.getLong(0)
    // With accuracy=1000 the sketch is exact to ~0.1% of rank; allow 2%.
    assert(math.abs(approxP50 - exactP50).toDouble / exactP50 < 0.02,
      s"approx=$approxP50 exact=$exactP50")
  }
}
