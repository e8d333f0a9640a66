package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-corpus behavior of the paragraph-granularity near-dup tier:
  * window cutting, cross-doc-only pairing, contamination arithmetic,
  * cluster census, and the (doc_id, pos) -> BIGINT packing bound.
  */
class ParagraphSpec extends SparkSpec {

  private def words(prefix: String, from: Int, until: Int): String =
    (from until until).map(i => f"$prefix$i%03d").mkString(" ")

  test("paragraph near-dup: shared 40-token window marks both docs, intra-doc repeats don't") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_para_hand").toString
    // doc 0: [SHARED | a-block]  -> 2 paragraphs, 1 contaminated
    // doc 1: [SHARED | b-block]  -> 2 paragraphs, 1 contaminated
    // doc 2: [c-block | c-block2] -> unique, absent from the output
    // doc 3: [d-block | d-block]  -> the SAME paragraph twice WITHIN one
    //   doc: band-identical, but the cross-doc filter must drop it —
    //   intra-doc repetition is tdp_repeated_spans' domain.
    val shared = words("w", 1, 41)
    val docs = Seq(
      (0L, shared + " " + words("a", 41, 81)),
      (1L, shared + " " + words("b", 41, 81)),
      (2L, words("c", 1, 81)),
      (3L, words("d", 1, 41) + " " + words("d", 1, 41)))
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")

    val out = Registry.queries("tdp_paragraph_neardup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // Both partners report 2 paragraphs, 1 shared, 1 partner doc,
    // contamination 1e6 div 2 = 500000; docs 2 and 3 never appear.
    assert(out.toSet == Set(
      (0L, 2L, 1L, 1L, 500000L),
      (1L, 2L, 1L, 1L, 500000L)), out.mkString(", "))

    val census = Registry.queries("tdp_paragraph_clusters")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // One cross-doc cluster: 2 paragraphs spanning 2 docs.
    assert(census.toSeq == Seq((2L, 2L, 1L)), census.mkString(", "))

    // Keep-first excision: 8 windows total (2 per doc, all 40 tokens),
    // the one cross-doc cluster drops its non-minimum member — 7 kept,
    // 320 tokens -> 280, savings 40e6 div 320 = 125000 — and the
    // re-derived representative audit holds.
    val ap = Registry.queries("tdp_paragraph_dedup_apply")(spark, dir)
      .collect().head
    val got = (0 until 10).map(ap.getLong)
    assert(got == Seq(8L, 2L, 7L, 1L, 1L, 320L, 280L, 40L, 125000L, 1L),
      got.mkString(", "))
  }

  test("packing bound: gate-corpus paragraph positions sit far under ParaPosCap") {
    // pkey = doc_id * 4096 + pos aliases silently if pos ever reaches
    // 4096 (a 163,840-token document). The synthetic corpus tops out at
    // a few hundred tokens; assert a wide margin so testdata
    // regenerations that grow documents get a loud signal here instead
    // of a silent key collision inside the CC.
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val maxPos = Registry.table(spark, dir, "documents")
        .select(expr(
          raw"size(filter(split(text, '\\s+'), x -> x != ''))").as("n"))
        .agg(max(expr("CAST(ceil(n / 40.0) AS BIGINT) - 1")).as("mp"))
        .collect().head.getLong(0)
      assert(maxPos >= 0 && maxPos < 256,
        s"$dir: max paragraph pos $maxPos approaches the 4096 packing " +
          "cap — widen the pkey to a struct before this corpus ships")
    }
  }
}
