package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  test("asOf attaches the latest right row at-or-before each left time") {
    val s = spark
    import s.implicits._
    val left = Seq(
      ("u1", 10L, "l1"), ("u1", 20L, "l2"), ("u1", 5L, "l0"),
      ("u2", 15L, "l3")).toDF("k", "t", "lid")
    val right = Seq(
      ("u1", 8L, "r1", 1.0), ("u1", 10L, "r2", 2.0), ("u1", 19L, "r3", 3.0),
      ("u2", 30L, "r4", 4.0)).toDF("k", "t", "rid", "v")

    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", Seq("rid", "v"), "rid")
      .collect()
      .map(r => (r.getString(2), Option(r.getString(3)), Option(r.get(4))))
      .sortBy(_._1)

    assert(out.toSeq == Seq(
      ("l0", None, None),               // u1@5: nothing at or before
      ("l1", Some("r2"), Some(2.0)),    // u1@10: inclusive match at t=10
      ("l2", Some("r3"), Some(3.0)),    // u1@20: latest prior is t=19
      ("l3", None, None)))              // u2@15: r4 is later
  }

  test("asOf picks the largest tie-breaker among same-time right rows") {
    val s = spark
    import s.implicits._
    val left = Seq(("u1", 10L, "l1")).toDF("k", "t", "lid")
    val right = Seq(
      ("u1", 10L, "rA", 1.0), ("u1", 10L, "rZ", 2.0)).toDF("k", "t", "rid", "v")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", Seq("rid", "v"), "rid")
      .collect().map(r => (r.getString(3), r.getDouble(4)))
    assert(out.toSeq == Seq(("rZ", 2.0)))
  }

  test("asOf never stitches columns from different right rows") {
    val s = spark
    import s.implicits._
    val left = Seq(("u1", 20L, "l1")).toDF("k", "t", "lid")
    // Latest right row has a NULL payload column; both attached values must
    // come from that same row (rid=r2, v=null), not mix r1's v.
    val right = Seq(
      ("u1", 10L, "r1", Option(1.0)), ("u1", 15L, "r2", Option.empty[Double]))
      .toDF("k", "t", "rid", "v")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", Seq("rid", "v"), "rid")
      .collect().map(r => (r.getString(3), Option(r.get(4))))
    assert(out.toSeq == Seq(("r2", None)))
  }
}
