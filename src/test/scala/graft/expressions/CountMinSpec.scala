package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CountMinSpec extends SparkSpec {

  private def registered = {
    GraftExtensions.registerAll(spark)
    spark
  }

  test("estimate never under-counts and is exact absent collisions") {
    val s = registered
    import s.implicits._
    // 2000 occurrences over 50 distinct keys into 4x512 counters: every
    // estimate must be >= the true count (the CMS one-sided guarantee).
    val rnd = new scala.util.Random(7)
    val keys = (1 to 2000).map(_ => rnd.nextInt(50).toLong + 1L)
    val df = keys.toDF("k")
    val sketch = df.agg(expr("graft_cms_agg(k, 512)").as("sk"))
      .head().getAs[Array[Byte]](0)
    val got = df.groupBy("k").agg(count(lit(1)).as("n"))
      .withColumn("est",
        call_function("graft_cms_estimate", col("k"), lit(sketch)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    got.foreach { case (k, n, est) =>
      assert(est >= n, s"key $k: estimate $est under-counts true $n")
    }
    // 50 keys x 4 independent rows of 512 buckets: at least one key
    // should see zero collisions in some row -> exact estimate.
    assert(got.exists { case (_, n, est) => est == n },
      "no key estimated exactly — hash rows are suspect")
  }

  test("partial aggregation + shuffle merge matches single-partition result") {
    val s = registered
    import s.implicits._
    val rnd = new scala.util.Random(13)
    val keys = (1 to 30000).map(_ => rnd.nextInt(400).toLong)
    def sketchOf(parts: Int): Seq[Byte] =
      keys.toDF("k").repartition(parts)
        .agg(expr("graft_cms_agg(k, 256)").as("sk"))
        .head().getAs[Array[Byte]](0).toSeq
    // Element-wise counter addition must be exactly associative: the
    // serialized sketch is bit-identical at any parallelism.
    assert(sketchOf(16) == sketchOf(1))
  }

  test("bucket arithmetic is the documented affine permutation") {
    // Pin the cross-engine contract: the oracle replicates
    // ((k*A_r + B_r) mod P) mod W with these exact constants.
    assert(CountMin.bucket(0L, 0, 512) == (7L % 512L).toInt)
    assert(CountMin.bucket(1000L, 1, 512) ==
      (((1000L * 131L + 101L) % 1000000007L) % 512L).toInt)
    // Negative keys fold into [0, P) first — no negative array index.
    (0 until CountMin.Depth).foreach { r =>
      val b = CountMin.bucket(-42L, r, 512)
      assert(b >= 0 && b < 512)
    }
  }

  test("sketch dot product never under-estimates the equi-join size") {
    val s = registered
    import s.implicits._
    // A: key k appears k times (k=1..40); B: key k appears 41-k times.
    // |A JOIN B| = sum k*(41-k), exactly computable.
    val a = (1 to 40).flatMap(k => Seq.fill(k)(k.toLong)).toDF("k")
    val b = (1 to 40).flatMap(k => Seq.fill(41 - k)(k.toLong)).toDF("k")
    val truth = (1 to 40).map(k => k.toLong * (41 - k)).sum
    def sk(df: org.apache.spark.sql.DataFrame, w: Int) =
      df.agg(expr(s"graft_cms_agg(k, $w)")).head().getAs[Array[Byte]](0)
    // Wide sketch (no collisions among 40 keys): estimate is EXACT.
    val exact = s.range(1)
      .select(call_function("graft_cms_dot", lit(sk(a, 4096)), lit(sk(b, 4096))))
      .head().getLong(0)
    assert(exact == truth, s"collision-free dot $exact != $truth")
    // Narrow sketch (forced collisions): one-sided guarantee holds.
    val coarse = s.range(1)
      .select(call_function("graft_cms_dot", lit(sk(a, 8)), lit(sk(b, 8))))
      .head().getLong(0)
    assert(coarse >= truth, s"dot $coarse under-counts join size $truth")
  }

  test("dot of partial-merged sketches equals dot of single-partition sketches") {
    val s = registered
    import s.implicits._
    val rnd = new scala.util.Random(29)
    val a = (1 to 5000).map(_ => rnd.nextInt(300).toLong).toDF("k")
    val b = (1 to 5000).map(_ => rnd.nextInt(300).toLong).toDF("k")
    def dot(parts: Int): Long = {
      def sk(df: org.apache.spark.sql.DataFrame) =
        df.repartition(parts).agg(expr("graft_cms_agg(k, 256)"))
          .head().getAs[Array[Byte]](0)
      s.range(1).select(call_function("graft_cms_dot", lit(sk(a)), lit(sk(b))))
        .head().getLong(0)
    }
    assert(dot(16) == dot(1))
  }

  test("nulls are ignored in the build") {
    val s = registered
    import s.implicits._
    val rows: Seq[Option[Long]] = Seq(Some(5L), None, Some(5L), None)
    val sketch = rows.toDF("k")
      .agg(expr("graft_cms_agg(k, 64)").as("sk"))
      .head().getAs[Array[Byte]](0)
    val est = rows.flatten.distinct.toDF("k")
      .withColumn("est",
        call_function("graft_cms_estimate", col("k"), lit(sketch)))
      .head().getLong(1)
    assert(est == 2L, s"two non-null occurrences, estimated $est")
  }
}
