package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Registry

class BloomSpec extends SparkSpec {

  private def registered = {
    GraftExtensions.registerAll(spark)
    spark
  }

  test("bloom build + probe: zero false negatives, bounded false positives") {
    val s = registered
    import s.implicits._
    val members = (0L until 20000L).map(_ * 7 + 3)
    val bytes = members.toDF("k")
      .agg(call_function("graft_bloom_agg", col("k"), lit(20000L), lit(0.01)))
      .head().getAs[Array[Byte]](0)
    // Sketch is fixed-size: ~24 KB for 20k keys at 1% fpp, not data-sized.
    assert(bytes.length < 200 * 1024, s"sketch unexpectedly large: ${bytes.length}")

    val probe = (0L until 40000L).map(_ * 7 + 3) // first half members
      .toDF("k")
      .select(col("k"),
        call_function("graft_bloom_contains", col("k"), lit(bytes)).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val memberSet = members.toSet
    // Contract: NEVER a false negative.
    members.foreach(m => assert(probe(m), s"false negative on $m"))
    val nonMembers = probe.keys.filterNot(memberSet)
    val fp = nonMembers.count(probe)
    assert(fp.toDouble / nonMembers.size < 0.05,
      s"false-positive rate ${fp.toDouble / nonMembers.size} >= 5%")
  }

  test("partial build + shuffle merge equals single-partition build") {
    val s = registered
    import s.implicits._
    val keys = (1L to 30000L).map(_ * 1315423911L)
    def build(parts: Int) = keys.toDF("k").repartition(parts)
      .agg(call_function("graft_bloom_agg", col("k"), lit(30000L), lit(0.01)))
      .head().getAs[Array[Byte]](0)
    // Insertion is commutative (bit OR), so the merged filter is
    // bit-identical to the sequential one.
    assert(java.util.Arrays.equals(build(1), build(8)))
  }

  test("tdp_bloom_dedup prefilter is lossless and both branches fire") {
    val s = registered
    val dir = "/root/testdata/sf0.001"
    val rows = Registry.queries("tdp_bloom_dedup")(s, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))

    rows.foreach { case (id, nChunks, nKnown, novel) =>
      assert(nKnown <= nChunks, s"doc $id: known $nKnown > chunks $nChunks")
      assert(novel == (nKnown == 0L), s"doc $id: flag/count mismatch")
    }
    // The split must exercise both branches or the test proves nothing:
    // some batch docs carry corpus-known chunks, some are fully novel.
    assert(rows.exists(_._3 > 0) && rows.exists(_._3 == 0),
      "testdata lacks both known and novel batch docs")
    // Oracle-equivalence of the counts themselves is the driver gate
    // (CORRECTNESS); here assert the bloom prefilter found EXACTLY the
    // exact-membership totals, i.e. the sketch was lossless end-to-end.
    val exact = {
      val ch = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          expr(raw"filter(split(text, '\\s+'), x -> x != '')").as("toks"))
        .select(col("doc_id"),
          explode(expr(
            """CASE WHEN size(toks) > 0 THEN
              |  transform(sequence(1, CAST(ceil(size(toks) / 10.0) AS INT)),
              |    i -> array_join(slice(toks, (i - 1) * 10 + 1, 10), ' '))
              |ELSE array(CAST(NULL AS STRING)) END""".stripMargin)).as("chunk"))
        .filter(col("chunk").isNotNull)
        .distinct()
      val corpus = ch.filter(col("doc_id") % 10 =!= 7)
        .select("chunk").distinct()
      ch.filter(col("doc_id") % 10 === 7)
        .join(corpus, Seq("chunk"), "left_semi")
        .groupBy("doc_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    rows.foreach { case (id, _, nKnown, _) =>
      assert(exact.getOrElse(id, 0L) == nKnown,
        s"doc $id: bloom path $nKnown != exact ${exact.getOrElse(id, 0L)}")
    }
  }
}
