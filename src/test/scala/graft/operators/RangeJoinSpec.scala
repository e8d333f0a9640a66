package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {

  test("bandJoin matches the naive theta join") {
    val s = spark
    import s.implicits._
    // Irregular timestamps incl. exact band-edge gaps and bucket-boundary
    // straddles (width 10: 9|10, 19|21, 100|109...).
    val rows = Seq(
      ("u1", 0L, 1L), ("u1", 9L, 2L), ("u1", 10L, 3L), ("u1", 19L, 4L),
      ("u1", 21L, 5L), ("u1", 100L, 6L), ("u1", 109L, 7L), ("u1", 111L, 8L),
      ("u2", 5L, 9L), ("u2", 15L, 10L), ("u2", 26L, 11L), ("u3", 7L, 12L))
    val a = rows.toDF("user_id", "sec_a", "id_a")
    val b = rows.toDF("user_id", "sec_b", "id_b")

    val banded = RangeJoin.bandJoin(a, b, Seq("user_id"), "sec_a", "sec_b", 10L)
      .filter(col("id_a") < col("id_b"))
      .select("user_id", "id_a", "id_b").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    val naive = a.join(b, Seq("user_id"))
      .filter(abs(col("sec_a") - col("sec_b")) <= 10 && col("id_a") < col("id_b"))
      .select("user_id", "id_a", "id_b").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted

    assert(naive.nonEmpty) // the fixture must actually exercise the band
    assert(banded.toSeq == naive.toSeq)
  }

  test("bandJoin emits each qualifying pair exactly once") {
    val s = spark
    import s.implicits._
    // Same-bucket AND neighbor-bucket matches: each must appear once even
    // though the right side is replicated 3x.
    val a = Seq(("u", 10L, 1L), ("u", 12L, 2L)).toDF("user_id", "sec_a", "id_a")
    val b = Seq(("u", 10L, 1L), ("u", 12L, 2L)).toDF("user_id", "sec_b", "id_b")
    val out = RangeJoin.bandJoin(a, b, Seq("user_id"), "sec_a", "sec_b", 10L)
    assert(out.count() == 4L) // 2x2 pairs, all within band, no duplicates
  }

  test("bandJoin plans as a shuffle hash/merge join, not a nested loop") {
    val s = spark
    import s.implicits._
    val a = (1 to 100).map(i => ("u" + i % 7, i.toLong, i.toLong))
      .toDF("user_id", "sec_a", "id_a")
    val b = (1 to 100).map(i => ("u" + i % 7, i.toLong, 1000L + i))
      .toDF("user_id", "sec_b", "id_b")
    val plan = RangeJoin.bandJoin(a, b, Seq("user_id"), "sec_a", "sec_b", 60L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"nested loop in plan:\n$plan")
  }
}
