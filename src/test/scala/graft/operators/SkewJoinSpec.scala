package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {

  test("saltedJoin matches plain inner join on skewed keys") {
    val s = spark
    import s.implicits._
    // 10k rows on 3 keys, one key carrying 80% of rows.
    val left = (1 to 10000).map { i =>
      (if (i <= 8000) "hot" else s"k${i % 3}", i.toLong)
    }.toDF("k", "v")
    val right = Seq(("hot", 1.5), ("k0", 2.0), ("k1", 3.0)).toDF("k", "w")

    val plain = left.join(right, Seq("k"), "inner")
      .agg(sum(col("v") * col("w"))).head.getDouble(0)
    val salted = SkewJoin.saltedJoin(left, right, Seq("k"), buckets = 8)
      .agg(sum(col("v") * col("w"))).head.getDouble(0)
    assert(plain == salted)
  }

  test("saltedJoin preserves left-join unmatched rows exactly once") {
    val s = spark
    import s.implicits._
    val left = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("k", "v")
    val right = Seq(("a", 10.0)).toDF("k", "w")
    val out = SkewJoin.saltedJoin(left, right, Seq("k"), buckets = 4, "left")
      .collect().map(r => (r.getString(0), r.getLong(1), Option(r.get(2))))
      .sortBy(_._1)
    assert(out.length == 3)
    assert(out.count(_._3.isEmpty) == 2) // b and c unmatched, once each
  }

  test("salt spreads exact-duplicate payload rows across buckets") {
    val s = spark
    import s.implicits._
    // The classic dedup-shaped hot key: thousands of IDENTICAL rows. A
    // payload-only hash collapses them into one bucket; the per-row
    // ordinal in the salt must keep them spread.
    val dups = Seq.fill(4000)(("hot", 7L)).toDF("k", "v")
    val nSalts = dups
      .withColumn("_salt", SkewJoin.saltExpr(Seq("v"), 8, None))
      .select(countDistinct(col("_salt"))).head.getLong(0)
    assert(nSalts >= 4, s"expected duplicates over >=4 of 8 buckets, got $nSalts")

    // And the join result stays correct: every duplicate matches once.
    val right = Seq(("hot", 2.0)).toDF("k", "w")
    val n = SkewJoin.saltedJoin(dups, right, Seq("k"), buckets = 8).count()
    assert(n == 4000L)
  }

  test("saltedAggregate matches direct aggregation") {
    val s = spark
    import s.implicits._
    val df = (1 to 5000).map(i => (if (i % 10 == 0) "cold" else "hot", i.toLong))
      .toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val salted = SkewJoin.saltedAggregate(df, Seq("k"), buckets = 16,
      partialAggs = Seq(sum("v").as("ps"), count(lit(1)).as("pn")),
      finalAggs = Seq(sum("ps").as("s"), sum("pn").as("n")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(direct.toSeq == salted.toSeq)
  }
}
