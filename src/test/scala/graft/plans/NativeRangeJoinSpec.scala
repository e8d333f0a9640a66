package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NativeRangeJoinSpec extends SparkSpec {

  private def frames(n: Int, seed: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val rows = (1 to n).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val a = rows.toDF("k", "t", "id")
      .select(col("k"), col("t").as("t_a"), col("id").as("id_a"))
    val b = rows.map { case (k, t, i) => (k, (t + 17) % 1000, i + 100000) }
      .toDF("k_b", "t_b", "id_b")
    (a, b)
  }

  test("native exec matches the bucket-replica rewrite pair for pair") {
    val (a, b) = frames(400, 31)
    val native = NativeRangeJoin
      .bandJoin(a, b, "k", "t_a", "k_b", "t_b", 25L)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // Independent truth: the DataFrame-level bucket rewrite (itself
    // oracle-certified by q24) over renamed-compatible frames.
    val viaBuckets = graft.operators.RangeJoin
      .bandJoin(a.withColumnRenamed("k", "kk"),
        b.withColumnRenamed("k_b", "kk"), Seq("kk"), "t_a", "t_b", 25L)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native == viaBuckets,
      s"missing=${(viaBuckets -- native).take(5)} extra=${(native -- viaBuckets).take(5)}")
    assert(native.nonEmpty)
  }

  test("band bounds are inclusive and key groups never leak") {
    import spark.implicits._
    val a = Seq((1L, 100L, 1L), (2L, 100L, 2L)).toDF("k", "t_a", "id_a")
    val b = Seq((1L, 90L, 10L), (1L, 110L, 11L), (1L, 111L, 12L),
      (1L, 89L, 13L), (2L, 100L, 20L)).toDF("k_b", "t_b", "id_b")
    val got = NativeRangeJoin.bandJoin(a, b, "k", "t_a", "k_b", "t_b", 10L)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // +/-10 inclusive: 90 and 110 match, 89 and 111 do not; key 2 only
    // pairs within key 2.
    assert(got == Set((1L, 10L), (1L, 11L), (2L, 20L)))
  }

  test("plan: custom strategy fires, no exchange and no nested loop") {
    val (a, b) = frames(200, 7)
    val df = NativeRangeJoin.bandJoin(a, b, "k", "t_a", "k_b", "t_b", 25L)
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix in plan strings.
    assert(plan.contains("BroadcastRangeJoin"), plan.take(2000))
    assert(!plan.contains("Exchange"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("as-of: floor probe, left-join nulls, loud duplicate rejection") {
    import spark.implicits._
    val l = Seq((1L, 100L, 1L), (1L, 5L, 2L), (2L, 50L, 3L))
      .toDF("k", "t_a", "id_a")
    val r = Seq((1L, 90L, 10L), (1L, 100L, 11L), (1L, 110L, 12L))
      .toDF("k_b", "t_b", "id_b")
    val got = NativeRangeJoin.asOfJoin(l, r, "k", "t_a", "k_b", "t_b")
      .select("id_a", "id_b").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1)))
      .toSet
    // id 1 at t=100 takes the exact-time row 11 (floor includes equal);
    // id 2 predates every build row -> null; key 2 has no build rows.
    assert(got == Set((1L, 11L), (2L, -1L), (3L, -1L)))
    // Duplicate (key, time) on the build side must fail loudly.
    val dup = Seq((1L, 90L, 10L), (1L, 90L, 11L)).toDF("k_b", "t_b", "id_b")
    val ex = intercept[Exception] {
      NativeRangeJoin.asOfJoin(l, dup, "k", "t_a", "k_b", "t_b").collect()
    }
    assert(ex.getMessage != null)
  }

  test("as-of: matches the union+window operator on random data") {
    val (a, b) = frames(300, 97)
    val native = NativeRangeJoin
      .asOfJoin(a.select(col("k"), col("t_a"), col("id_a")),
        b.groupBy(col("k_b"), col("t_b")).agg(max("id_b").as("id_b")),
        "k", "t_a", "k_b", "t_b")
      .select("id_a", "id_b").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val viaWindow = graft.operators.AsOfJoin
      .asOf(a.withColumnRenamed("k", "kk").withColumnRenamed("t_a", "tt"),
        b.groupBy(col("k_b"), col("t_b")).agg(max("id_b").as("id_b"))
          .withColumnRenamed("k_b", "kk").withColumnRenamed("t_b", "tt"),
        Seq("kk"), "tt", Seq("id_b"), "id_b")
      .select("id_a", "id_b_asof").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(native == viaWindow,
      s"diff=${(viaWindow.toSet -- native.toSet).take(5)}")
  }

  test("null keys/times never match: inner drops, as-of null-extends") {
    import spark.implicits._
    val l = Seq(
      (Some(1L), Some(100L), 1L),   // normal match
      (None: Option[Long], Some(100L), 2L), // null key
      (Some(1L), None: Option[Long], 3L),   // null time
      (Some(9L), Some(100L), 4L))   // key only on build side as null
      .toDF("k", "t_a", "id_a")
    val r = Seq(
      (Some(1L), Some(95L), 10L),
      (None: Option[Long], Some(100L), 11L), // null build key: indexed by nobody
      (Some(1L), None: Option[Long], 12L),   // null build time: never matches
      (Some(9L), Some(200L), 13L))
      .toDF("k_b", "t_b", "id_b")
    // Inner band join: only the fully-non-null (1, 100)x(1, 95) pair.
    val band = NativeRangeJoin.bandJoin(l, r, "k", "t_a", "k_b", "t_b", 10L)
      .select("id_a", "id_b").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(band == Set((1L, 10L)))
    // Same answer as Spark's own inner join with the declarative band
    // condition over the same nullable frames.
    val viaSpark = l.join(r, col("k") === col("k_b") &&
        abs(col("t_a") - col("t_b")) <= lit(10L))
      .select("id_a", "id_b").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(band == viaSpark)
    // As-of is a LEFT join: null-key/time left rows flow through
    // null-extended; build rows with null key/time match nobody.
    val asof = NativeRangeJoin.asOfJoin(l, r, "k", "t_a", "k_b", "t_b")
      .select("id_a", "id_b").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1)))
      .toSet
    assert(asof == Set((1L, 10L), (2L, -1L), (3L, -1L), (4L, -1L)))
  }

  test("overlapping column names across sides fail loudly") {
    import spark.implicits._
    val l = Seq((1L, 100L, 1L)).toDF("k", "t", "id")
    val r = Seq((1L, 95L, 2L)).toDF("k_b", "t", "id_b") // shares "t"
    val e1 = intercept[IllegalArgumentException] {
      NativeRangeJoin.bandJoin(l, r, "k", "t", "k_b", "t", 10L)
    }
    assert(e1.getMessage.contains("disjoint"))
    val e2 = intercept[IllegalArgumentException] {
      NativeRangeJoin.asOfJoin(l, r, "k", "t", "k_b", "t")
    }
    assert(e2.getMessage.contains("disjoint"))
  }

  test("as-of rejects a non-Long LEFT time column loudly") {
    import spark.implicits._
    val l = Seq((1L, 100, 1L)).toDF("k", "t_a", "id_a") // t_a is Int
    val r = Seq((1L, 95L, 2L)).toDF("k_b", "t_b", "id_b")
    val ex = intercept[Exception] {
      NativeRangeJoin.asOfJoin(l, r, "k", "t_a", "k_b", "t_b").collect()
    }
    assert(ex.getMessage.contains("LongType"),
      s"expected loud LongType failure, got: ${ex.getMessage}")
  }

  test("registration via SparkSessionExtensions config plans the operator") {
    // registerAll (used by every session here) must install the strategy
    // idempotently.
    graft.expressions.GraftExtensions.registerAll(spark)
    graft.expressions.GraftExtensions.registerAll(spark)
    assert(spark.experimental.extraStrategies
      .count(_ == RangeJoinStrategy) == 1)
  }
}
