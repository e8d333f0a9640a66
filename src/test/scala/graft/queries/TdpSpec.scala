package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.SparkSpec

/** Scale-guard behavior of the near-dup operators: the LSH hot-bucket
  * cap, the losslessness of the prefix-filtered Jaccard join, and the
  * 64-bit SimHash width.
  */
class TdpSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("LSH pairs: a hot bucket larger than the cap star-collapses, O(N) edges") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_lsh_hot").toString
    // 60 identical docs -> every band bucket has 60 members (> cap 50):
    // the bucket must NOT emit its 1770 all-pairs (the per-task N^2
    // guard) but MUST stay connected via the star onto the min doc —
    // exact clones are exactly what a dedup sweep exists to catch. Two
    // more identical docs form a bucket of 2 that pairs normally.
    val cloneText = "alpha beta gamma delta epsilon zeta eta theta"
    val pairText = "one two three four five six seven eight nine"
    val docs = (0L until 60L).map(i => (i, cloneText)) ++
      Seq((100L, pairText), (101L, pairText))
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val pairs = Registry.queries("tdp_minhash_lsh_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((100L, 101L)),
      "small bucket must still produce its pair")
    val clonePairs = pairs.filter { case (a, b) => a < 60L && b < 60L }
    assert(clonePairs === (1L until 60L).map((0L, _)).toSet,
      s"oversize bucket must star-collapse onto doc 0, got $clonePairs")
    // And the star keeps the clone group ONE cluster for the dedup
    // consumers: 60 clones + 2 pair docs -> 2 clusters, 60 dup docs.
    val rate = Registry.queries("tdp_dup_rate")(spark, dir).collect().head
    assert(rate.getLong(0) === 62L && rate.getLong(1) === 2L
      && rate.getLong(2) === 60L,
      s"clone group must survive as one cluster: $rate")
  }

  test("decontamination removes exactly the train docs sharing a shingle with eval") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_decon").toString
    // doc 200 is the eval slice (doc_id % 100 == 0); doc 1 shares the
    // "secret eval holdout" 3-gram with it; doc 2 has no overlap.
    val docs = Seq(
      (200L, "the secret eval holdout passage lives right here", "en"),
      (1L, "many prefix words then secret eval holdout appears", "en"),
      (2L, "completely different sentence with no shared trigrams anywhere", "de"))
    docs.toDF("doc_id", "text", "lang").write.parquet(s"$dir/documents.parquet")
    val survivors = Registry.queries("tdp_decontaminate")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(survivors == Set((2L, "de")),
      s"only the non-overlapping train doc may survive, got $survivors")
  }

  /** The naive all-shared-shingles Jaccard join (round-1 formulation). */
  private def naiveJaccard(d: DataFrame): DataFrame = {
    val exploded = d.select(col("doc_id"), col("n_sh"),
      explode(col("hashes")).as("sh"))
    val a = exploded.select(col("doc_id").as("doc_a"), col("n_sh").as("na"),
      col("sh"))
    val b = exploded.select(col("doc_id").as("doc_b"), col("n_sh").as("nb"),
      col("sh"))
    a.join(b, Seq("sh")).filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b", "na", "nb")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast(DoubleType)
          / (col("na") + col("nb") - col("inter")).cast(DoubleType))
      .filter(col("jaccard") >= 0.2)
      .select("doc_a", "doc_b", "inter", "jaccard")
  }

  test("prefix-filtered Jaccard equals the naive all-pairs join") {
    graft.expressions.GraftExtensions.registerAll(spark)
    val toks = raw"filter(split(text, '\\s+'), x -> x != '')"
    val shingles =
      """array_distinct(CASE WHEN size(toks) >= 3 THEN
        |  transform(sequence(1, size(toks) - 2), i ->
        |    concat(element_at(toks, i), ' ', element_at(toks, i + 1), ' ',
        |      element_at(toks, i + 2)))
        |  ELSE array() END)""".stripMargin
    val d = Registry.table(spark, sf, "documents")
      .withColumn("toks", expr(toks))
      .withColumn("shingles", expr(shingles))
      .withColumn("hashes", expr("transform(shingles, sh -> graft_polyhash(sh))"))
      .select(col("doc_id"), col("hashes"), size(col("hashes")).as("n_sh"))
      .filter(col("n_sh") > 0)
    val expected = naiveJaccard(d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = Registry.queries("tdp_ngram_jaccard")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(expected.nonEmpty, "fixture should contain near-dup pairs")
    assert(got === expected)
  }

  test("simhash signatures use the full 64-bit range") {
    val sigs = Registry.queries("tdp_simhash")(spark, sf)
      .select(col("simhash").cast(LongType)).collect().map(_.getLong(0))
    assert(sigs.nonEmpty)
    // With 64 independent hyperplanes, high bits are ~uniform: some doc
    // must set bit 63 (negative long) and bits 32..62.
    assert(sigs.exists(_ < 0L), "bit 63 never set — signature is not 64-bit")
    assert(sigs.exists(s => (s >>> 32) != 0L && s > 0L),
      "bits 32..62 never set")
  }

  test("dup clusters: planted clone groups collapse to min-id components") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_cc").toString
    // Two clone groups (LSH pairs them via identical signatures in every
    // band) plus a singleton: components {0,1,2}, {10,11}, {20}.
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = "one two three four five six seven eight nine ten eleven"
    val c = "lonely document with entirely distinct trigram content here"
    val docs = Seq((0L, a), (1L, a), (2L, a), (10L, b), (11L, b), (20L, c))
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val rows = Registry.queries("tdp_dup_clusters")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSet
    assert(rows === Set(
      (0L, 0L, 3L, true), (1L, 0L, 3L, false), (2L, 0L, 3L, false),
      (10L, 10L, 2L, true), (11L, 10L, 2L, false),
      (20L, 20L, 1L, true)))
  }

  test("pii scan counts digit runs and emails, redaction is digit-free") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_pii").toString
    Seq((1L, "Customer#000000001"), (2L, "write me at bob.smith@example.com"),
      (3L, "no sensitive content"))
      .toDF("c_custkey", "c_name").write.parquet(s"$dir/customer.parquet")
    val rows = Registry.queries("tdp_pii_scan")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(rows === Set((1L, 1, 0), (2L, 0, 1), (3L, 0, 0)))
    // Redaction invariant: the md5 of the digit-masked text equals a
    // direct recomputation (no digits survive the mask).
    val direct = Registry.table(spark, dir, "customer")
      .select(md5(regexp_replace(col("c_name"), "[0-9]", "#")
        .cast(org.apache.spark.sql.types.BinaryType)).as("m"))
      .collect().map(_.getString(0)).toSet
    val fromQuery = Registry.queries("tdp_pii_scan")(spark, dir)
      .select("redacted_md5").collect().map(_.getString(0)).toSet
    assert(fromQuery === direct)
  }

  test("repetition ratios: a fully-repeated doc scores high, a distinct one zero") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_rep").toString
    Seq((1L, "spam spam spam spam spam spam"),
      (2L, "six completely distinct tokens right here"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val rows = Registry.queries("tdp_repetition")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getDouble(3), r.getDouble(4)))).toMap
    // doc 1: 6 tokens, 1 distinct; 4 shingle slots, 1 distinct shingle.
    assert(rows(1L) === ((6, 1, 1.0 - 1.0 / 6.0, 1.0 - 1.0 / 4.0)))
    // doc 2: all distinct -> both ratios exactly 0.
    assert(rows(2L)._3 === 0.0 && rows(2L)._4 === 0.0)
  }

  test("tfidf top terms rank rare-but-frequent terms first") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_tfidf").toString
    // "rare" appears 3x in doc 1 only (df=1); "common" is everywhere
    // (df=3 = N, so score 0). Top term of doc 1 must be "rare".
    Seq((1L, "rare rare rare common filler"),
      (2L, "common other words here"),
      (3L, "common more words again"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val top1 = Registry.queries("tdp_tfidf_topterms")(spark, dir)
      .filter(col("doc_id") === 1L && col("rank") === 1)
      .collect().map(r => (r.getString(1), r.getLong(4))).head
    assert(top1 === (("rare", 3L * (3L - 1L))))
    // N == df terms carry zero weight.
    val commonScores = Registry.queries("tdp_tfidf_topterms")(spark, dir)
      .filter(col("tok") === "common").select("score")
      .collect().map(_.getLong(0)).toSet
    assert(commonScores.subsetOf(Set(0L)))
  }

  test("sketch overlap estimates slice Jaccard within KMV error bounds") {
    val r = Registry.queries("tdp_sketch_overlap")(spark, sf).collect().head
    val (kEff, est, exact) = (r.getInt(0), r.getDouble(2), r.getDouble(3))
    assert(kEff === 128, "union sketch should be full at this corpus size")
    // KMV standard error ~ 1/sqrt(k) ≈ 0.088 at k=128; 3 sigma bound.
    assert((est - exact).abs <= 3.0 / math.sqrt(128.0),
      s"estimate $est too far from exact $exact")
  }

  test("lsh recall metric is consistent: hits bounded by exact and candidates") {
    val r = Registry.queries("tdp_lsh_recall")(spark, sf).collect().head
    val (nExact, nCand, nHit, recall) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(nExact > 0, "fixture corpus should contain exact near-dup pairs")
    assert(nHit <= nExact && nHit <= nCand)
    assert(recall >= 0.0 && recall <= 1.0)
    assert(recall == nHit.toDouble / nExact.toDouble)
  }

  test("ann recall: truth is 3 per query; hits bounded; misses cross buckets") {
    val r = Registry.queries("tdp_ann_recall")(spark, sf).collect().head
    val (nExact, nCand, nHit, recall) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    val nq = Registry.table(spark, sf, "embeddings")
      .filter(col("vec_id") % 50 === 0).count()
    assert(nExact === nq * 3, "brute-force truth is exactly top-3 per query")
    assert(nHit <= nExact && nHit <= nCand)
    assert(recall >= 0.0 && recall <= 1.0)
    assert(recall == nHit.toDouble / nExact.toDouble)
  }

  test("lang confusion matrix partitions the corpus; shares sum to 1 per label") {
    val rows = Registry.queries("tdp_lang_confusion")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    val total = rows.map(_._3).sum
    val corpus = Registry.table(spark, sf, "documents").count()
    assert(total === corpus, "confusion cells must partition the corpus")
    rows.groupBy(_._1).foreach { case (lang, cells) =>
      val share = cells.map(_._4).sum
      assert((share - 1.0).abs < 1e-9, s"label $lang shares sum to $share")
    }
  }

  test("simhash pairs: clones collide at hamming 0; all pairs within threshold") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_sh_pairs").toString
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val c = "utterly different words compose this other document body text"
    Seq((1L, a), (2L, a), (9L, c)).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val rows = Registry.queries("tdp_simhash_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.contains((1L, 2L, 0)), s"clones must pair at hamming 0: ${rows.toSeq}")
    assert(rows.forall(_._3 <= 3))
    assert(rows.forall(p => p._1 < p._2))
  }

  test("dup rate aggregates the cluster frame consistently") {
    val clusters = Registry.queries("tdp_dup_clusters")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
    val r = Registry.queries("tdp_dup_rate")(spark, sf).collect().head
    assert(r.getLong(0) === clusters.length.toLong)
    assert(r.getLong(1) === clusters.map(_._2).distinct.length.toLong)
    assert(r.getLong(2) === clusters.count(!_._3).toLong)
    assert(r.getDouble(3) === r.getLong(2).toDouble / r.getLong(0).toDouble)
  }

  test("chunk dedup drops corpus-boilerplate segments, keeps doc order") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_chunk").toString
    // One 10-token chunk shared by 3 docs (df = 3 = cap -> boilerplate);
    // each doc's second chunk is unique (df = 1 -> kept). Doc 4 is ONLY
    // the boilerplate chunk -> everything dropped, empty kept_text.
    val boiler = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"
    def uniq(i: Int) = (1 to 10).map(j => s"u${i}_$j").mkString(" ")
    val docs = Seq(
      (1L, s"$boiler ${uniq(1)}"), (2L, s"$boiler ${uniq(2)}"),
      (3L, s"$boiler ${uniq(3)}"), (4L, boiler))
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val rows = Registry.queries("tdp_chunk_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(rows(1L) === ((2L, 1L, 1L, uniq(1))))
    assert(rows(2L) === ((2L, 1L, 1L, uniq(2))))
    assert(rows(3L) === ((2L, 1L, 1L, uniq(3))))
    assert(rows(4L) === ((1L, 0L, 1L, "")))
  }

  test("bigram logprob: integer micro-nat sums match a direct computation") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_bigram").toString
    // Corpus: doc 1 = "a b a b" (bigrams ab, ba, ab), doc 2 = "a b",
    // doc 3 = "x" (no bigrams). cb(ab)=3, cb(ba)=1; cu(a)=3, cu(b)=1;
    // vocab = {a, b, x} = 3.
    Seq((1L, "a b a b"), (2L, "a b"), (3L, "x"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val rows = Registry.queries("tdp_bigram_logprob")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def m(cBig: Long, cCtx: Long): Long =
      math.floor(math.log((cBig + 1.0) / (cCtx + 3.0)) * 1e6).toLong
    val ab = m(3, 3); val ba = m(1, 1)
    assert(rows(1L) === ((3L, 2 * ab + ba)))
    assert(rows(2L) === ((1L, ab)))
    assert(rows(3L) === ((0L, 0L)))
  }

  test("kmeans round conserves vectors; stayed counts bounded per cluster") {
    val rows = Registry.queries("tdp_ann_kmeans")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val nVecs = Registry.table(spark, sf, "embeddings").count()
    assert(rows.map(_._2).sum === nVecs, "iter-0 assignment must partition")
    assert(rows.map(_._3).sum === nVecs, "iter-1 assignment must partition")
    assert(rows.forall(r => r._4 <= r._2 && r._4 <= r._3),
      "stayed is a subset of both rounds' members")
    assert(rows.map(_._4).sum > 0, "a Lloyd round should keep some members")
    assert(rows.length <= 64, "at most nlist clusters")
  }

  test("quality buckets split the corpus into exact tertiles") {
    val rows = Registry.queries("tdp_quality_buckets")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet === Set("head", "middle", "tail"))
    val n = rows.values.sum
    // row_number tertiles: sizes differ by at most 1.
    assert(rows.values.forall(v => (v - n / 3).abs <= 1))
    // Quality ordering across buckets: (min, max) ranges must not
    // interleave — head's floor >= middle's ceiling >= ... (ties equal).
    val full = Registry.queries("tdp_quality_buckets")(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(full("head")._1 >= full("middle")._2)
    assert(full("middle")._1 >= full("tail")._2)
  }

  test("multi-probe recall: monotone in nprobe over the same ground truth") {
    val rows = Registry.queries("tdp_ann_recall_nprobe")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(1, 2))
    assert(rows.map(_._2).distinct.length === 1,
      "both probe counts score against the same exact top-3 truth")
    val Seq(r1, r2) = rows.toSeq
    assert(r2._3 >= r1._3, "probing a second bucket can only add hits")
    assert(r2._4 >= r1._4, "recall@2 must dominate recall@1")
    assert(rows.forall(r => r._4 >= 0.0 && r._4 <= 1.0))
  }

  test("repeated spans: cross-doc span covered exactly, unique text zero") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_spans").toString
    val span = "the quick brown fox jumps over lazy dogs" // exactly 8 tokens
    val docs = Seq(
      (1L, s"$span alpha beta"), // span as window [1..8] of 10 tokens
      (2L, s"gamma $span"), // span as window [2..9] of 9 tokens
      (3L, "unique words only here nothing repeated at all ever"))
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val rows = Registry.queries("tdp_repeated_spans")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows(1L) === ((10L, 8L)), "doc 1: the 8 span tokens covered")
    assert(rows(2L) === ((9L, 8L)), "doc 2: the 8 span tokens covered")
    assert(rows(3L) === ((9L, 0L)), "unique doc: nothing covered")
  }

  test("truncated-dim recall: monotone in dims, identity at full width") {
    val rows = Registry.queries("tdp_ann_truncdim")(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(rows.keySet === Set(16, 32, 64))
    val nExact = rows(64)._1
    assert(rows.values.forall(v => v._1 === nExact && v._2 <= nExact))
    assert(rows(64)._3 === 1.0, "full-width rank must reproduce the truth")
    assert(rows(16)._3 <= rows(32)._3 + 1e-9 &&
      rows(32)._3 <= rows(64)._3 + 1e-9,
      s"recall not monotone in prefix width: $rows")
  }

  test("incremental dedup: exact beats near, unique stays unique") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_incr").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base), // existing
      (2L, "some other existing corpus text that stands entirely alone ok"),
      (7L, base), // new batch: exact clone of 1 (and near-dup too -> exact wins)
      (17L, "some other existing corpus text that stands entirely apart ok"),
      (27L, "a brand new document with words shared by absolutely nobody"))
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val rows = Registry.queries("tdp_incremental_dedup")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    assert(rows.keySet === Set(7L, 17L, 27L), "only new-batch docs verdict'd")
    assert(rows(7L) === (("exact_dup", 1L)))
    assert(rows(17L) === (("near_dup", 2L)))
    assert(rows(27L) === (("unique", -1L)))
  }

  test("fuzzy decontamination: planted near-copy flagged, clean doc not") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_fuzzy").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (100L, base), // eval doc (id % 50 == 0)
      (101L, base + " extra"), // near-copy of the eval doc -> flagged
      (102L, "totally different words that never overlap anything here"),
      (200L, "another held out eval document with its own private text"))
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val rows = Registry.queries("tdp_fuzzy_decontaminate")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(rows.contains(101L), "near-copy of the eval doc must be flagged")
    assert(rows(101L)._1 === 1L)
    assert(rows(101L)._2 >= 0.5 && rows(101L)._2 < 1.0)
    assert(!rows.contains(102L), "unrelated training doc must not be flagged")
    assert(!rows.keySet.exists(_ % 50 == 0), "eval docs are never flagged")
  }

  test("sq8 quantized search: hits bounded by truth, recall stays high") {
    val r = Registry.queries("tdp_ann_sq8")(spark, sf).collect().head
    val (nExact, nHit, nTop1) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val recall = r.getDouble(3)
    assert(nHit <= nExact, "hits cannot exceed truth pairs")
    assert(nTop1 * 3 <= nExact, "one top-1 per query")
    // 8-bit quantization barely perturbs 64-dim cosine ranks: direct
    // computation on this fixture gives 29/30 hits (0.967) — assert a
    // loose floor so a broken scale/quantizer fails loudly.
    assert(recall >= 0.85, s"sq8 recall degraded: $recall")
  }

  test("pq adc search: counts consistent, compression constants honest") {
    val r = Registry.queries("tdp_ann_pq")(spark, sf).collect().head
    val (nExact, nHit) = (r.getLong(0), r.getLong(1))
    val recall = r.getDouble(2)
    val nq = Registry.queries("tdp_cosine_topk")(spark, sf)
      .select("q_id").distinct().count()
    assert(nExact === 3 * nq, "truth is top-3 per query")
    assert(nHit <= nExact && recall >= 0.0 && recall <= 1.0)
    assert(r.getLong(3) === 256L && r.getLong(4) === 4L)
  }

  test("ivfpq composition: routing prunes candidates, counts consistent") {
    val r = Registry.queries("tdp_ann_ivfpq")(spark, sf).collect().head
    val (nExact, nCand, nHit) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val recall = r.getDouble(3)
    val nVecs = Registry.queries("tdp_lsh_cosine_buckets")(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_vectors")).head.getLong(0)
    val nq = Registry.queries("tdp_cosine_topk")(spark, sf)
      .select("q_id").distinct().count()
    assert(nExact === 3 * nq, "truth is top-3 per query")
    assert(nHit <= nExact && recall >= 0.0 && recall <= 1.0)
    assert(recall === nHit.toDouble / nExact)
    // The point of IVF routing: the scored candidate set must be a small
    // fraction of the flat nq x (N-1) scan (nlist=64, nprobe=2 -> ~2/64).
    assert(nCand < nq * (nVecs - 1) / 4,
      s"routing barely pruned: $nCand of ${nq * (nVecs - 1)}")
    assert(nCand >= nHit, "every hit must have been a scored candidate")
  }

  test("semdedup: clone collapses to min id; orthogonal vectors all kept") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_semdedup").toString
    def axis(i: Int): Seq[Float] = Seq.tabulate(8)(j => if (j == i) 1f else 0f)
    val vecs = Seq(
      (1L, axis(0)), (2L, axis(0)), // exact clones -> one cluster, min id kept
      (3L, axis(1)), (4L, axis(2)), (5L, axis(3))) // mutually orthogonal
    vecs.toDF("vec_id", "embedding").write.parquet(s"$dir/embeddings.parquet")
    val rows = Registry.queries("tdp_semdedup")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(rows(1L) === ((1L, 0L, true)), "clone min id kept")
    assert(rows(2L) === ((1L, 1L, false)), "clone larger id dropped")
    Seq(3L, 4L, 5L).foreach(v =>
      assert(rows(v)._3 && rows(v)._2 === 0L, s"orthogonal vec $v kept"))
    // structural invariant: every cluster's min-id member survives
    rows.groupBy(_._2._1).foreach { case (_, members) =>
      assert(members.minBy(_._1)._2._3, "cluster min id is always kept")
    }
  }

  test("source mix partitions the corpus; contamination bounded by dups") {
    val rows = Registry.queries("tdp_source_mix")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(5), r.getLong(6)))
    val nDocs = Registry.table(spark, sf, "documents").count()
    assert(rows.map(_._2).sum === nDocs, "per-source doc counts partition")
    assert(rows.forall(r => r._5 <= r._4),
      "cross-source dups are a subset of a source's dup docs")
    val corpusDups = Registry.queries("tdp_dup_rate")(spark, sf)
      .collect().head.getLong(2)
    assert(rows.map(_._4).sum === corpusDups,
      "per-source dup docs must sum to the corpus dup count")
  }

  test("temperature mix flattens shares toward uniform; rates invert size") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_temp").toString
    // big source: 16 tokens; small source: 4 -> p_nat 0.8 / 0.2.
    val docs = Seq(
      (1L, "a b c d e f g h", "en", "big", 15L),
      (2L, "i j k l m n o p", "en", "big", 15L),
      (3L, "q r s t", "en", "small", 7L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = Registry.queries("tdp_temperature_mix")(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    val (bigT, bigNat, bigTemp, bigRate) = rows("big")
    val (smallT, _, smallTemp, smallRate) = rows("small")
    assert(bigT === 16L && smallT === 4L)
    assert(bigNat === 0.8)
    // alpha=0.5 pulls toward uniform: dominant share shrinks, small grows
    assert(bigTemp < 0.8 && smallTemp > 0.2,
      s"temperature must flatten shares, got $bigTemp / $smallTemp")
    assert(math.abs(bigTemp + smallTemp - 1.0) < 1e-5, "shares renormalize")
    assert(bigRate < 1.0 && smallRate > 1.0,
      "dominant source downsampled, small source upsampled")
  }

  test("importance resampling ranks target-like docs above off-target docs") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_dsir").toString
    // All-letter docs score ~0.83 quality (>= 0.75 target slice); digit
    // docs score ~0.26 (raw only). A fresh doc made of the TARGET's
    // vocabulary must outweigh one made of raw-only vocabulary.
    val tgtText = "goodword goodword goodword goodword"
    val rawText = "12345 67890 11111 22222"
    val docs = Seq(
      (1L, tgtText, "en", "s", 35L), (2L, tgtText, "en", "s", 35L),
      (3L, rawText, "en", "s", 23L), (4L, rawText, "en", "s", 23L),
      (5L, "goodword goodword", "en", "s", 17L), // target-vocab probe
      (6L, "12345 67890", "en", "s", 11L), // raw-vocab probe
      (7L, "", "en", "s", 0L)) // empty: zero tokens, zero weight
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = Registry.queries("tdp_importance_resample")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(rows.size === 7, "one verdict row per document")
    assert(rows(7L) === ((0L, 0L, false)), "empty doc: no tokens, no weight")
    assert(rows(5L)._2 > rows(6L)._2,
      s"target-vocab doc must outweigh raw-vocab doc: ${rows(5L)} vs ${rows(6L)}")
    assert(rows(5L)._3 && !rows(6L)._3,
      "sign of the weight separates the probe docs")
    assert(rows(5L)._1 === 2L && rows(6L)._1 === 2L, "token counts")
  }

  test("sequence packing: exact chunk count, tail padding and split docs") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_pack").toString
    def words(n: Int, pfx: String): String =
      (1 to n).map(i => s"$pfx$i").mkString(" ")
    // token stream in doc_id order: 60 | 10 | 62 -> W=64 chunks:
    // doc 1 [0,60) fits chunk 0; doc 2 [60,70) straddles 0->1; doc 3
    // [70,132) straddles 1->2. 132 tokens -> 3 chunks, 60 pad tokens.
    val docs = Seq(
      (1L, words(60, "a"), "en", "s", 0L),
      (2L, words(10, "b"), "en", "s", 0L),
      (3L, words(62, "c"), "en", "s", 0L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = Registry.queries("tdp_seq_packing")(spark, dir).collect().head
    assert(r.getLong(0) === 3L, "n_docs")
    assert(r.getLong(1) === 132L, "n_tokens")
    assert(r.getLong(2) === 3L, "n_chunks = ceil(132/64)")
    assert(r.getLong(3) === 60L, "tail padding = 3*64 - 132")
    assert(r.getLong(4) === 2L, "docs 2 and 3 straddle chunk boundaries")
    assert(math.abs(r.getDouble(5) - 2.0 / 3.0) < 1e-12, "split fraction")
  }

  test("keep-best dedup policy disagrees with min-id when a better copy exists") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_keepbest").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // doc 1 is the min-id cluster root but carries digit junk (lower
    // quality); docs 2 and 3 are clean clones -> keep_best must pick 2
    // (higher quality, tie broken by id), disagreeing with min-id.
    val docs = Seq(
      (1L, base + " 99999 88888", "en", "s", 0L),
      (2L, base, "en", "s", 0L),
      (3L, base, "en", "s", 0L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = Registry.queries("tdp_cluster_keep_best")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4))))
      .toMap
    assert(rows.keySet === Set(1L), "one multi-member cluster rooted at 1")
    val (n, keepBest, sameKeep, gain) = rows(1L)
    assert(n === 3L, "all three docs in the cluster")
    assert(keepBest === 2L, "highest-quality member, tie broken by doc_id")
    assert(!sameKeep, "policy disagrees with the min-id root")
    assert(gain > 0L, "keeping the best copy gains quality")
  }

  test("split leakage: val doc with a train clone is flagged, unique val is not") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_leak").toString
    val a = "alpha beta gamma delta epsilon zeta"
    val b = "one two three four five six seven"
    val c = "red green blue cyan magenta yellow"
    // val split = doc_id % 10 == 3. Doc 3 clones train doc 1; doc 13 is
    // unique; doc 23 clones train doc 24 (val doc is the cluster root).
    val docs = Seq((1L, a), (3L, a), (13L, b), (23L, c), (24L, c))
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val rows = Registry.queries("tdp_split_leakage")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(rows.keySet === Set(3L, 13L, 23L), "only val docs are audited")
    assert(rows(3L) === ((1L, true)), "train clone leaks into val doc 3")
    assert(rows(13L) === ((0L, false)), "unique val doc is clean")
    assert(rows(23L) === ((1L, true)),
      "leak detected even when the val doc is the cluster root")
  }

  test("doc novelty: all-unique shingles score 1.0, cloned docs score 0.0") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_novel").toString
    val docs = Seq(
      (1L, "a b c d e f"), // 4 shingles, none shared
      (2L, "x y z w"), (3L, "x y z w")) // 2 shingles each, df = 2
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val rows = Registry.queries("tdp_doc_novelty")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(rows(1L) === ((4L, 4L, 1.0)), "every shingle of doc 1 is unique")
    assert(rows(2L) === ((2L, 0L, 0.0)), "cloned doc has zero novelty")
    assert(rows(3L) === ((2L, 0L, 0.0)))
  }

  test("vocab top-k orders by count then token; share sums over the head") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_vocab").toString
    val docs = Seq((1L, "the the the cat"), (2L, "the dog"))
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val rows = Registry.queries("tdp_vocab_topk")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq === Seq("the", "cat", "dog"),
      "count desc, then token asc on ties")
    assert(rows(0) === (("the", 4L, 2L, 4.0 / 6.0)))
    assert(rows(1) === (("cat", 1L, 1L, 1.0 / 6.0)))
  }

  test("source-pair contamination localizes cross-source near-dups") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_srcpair").toString
    val t = "alpha beta gamma delta"
    val u = "one two three four"
    val docs = Seq(
      (1L, t, "srcA"), (2L, t, "srcB"), // cross-source near-dup
      (3L, u, "srcA"), (4L, u, "srcA")) // within-source near-dup
    docs.toDF("doc_id", "text", "source")
      .write.parquet(s"$dir/documents.parquet")
    val rows = Registry.queries("tdp_source_pair_contamination")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(rows === Map(("srcA", "srcB") -> 1L, ("srcA", "srcA") -> 1L),
      s"one cross pair and one within pair, got $rows")
  }

  test("budget select: greedy quality-ordered fill stops exactly at the budget") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_budget").toString
    def doc(nLetters: Int, nDigits: Int, pfx: String): String =
      ((1 to nLetters).map(i => s"$pfx$i") ++
        (1 to nDigits).map(i => s"${i}000")).mkString(" ")
    // 4 docs x 10 tokens; quality strictly decreasing with digit share.
    // Budget = 40/2 = 20 -> greedy takes the top-2 quality docs exactly.
    val docs = Seq(
      (1L, doc(10, 0, "a"), "en", "s", 0L),
      (2L, doc(9, 1, "b"), "en", "s", 0L),
      (3L, doc(8, 2, "c"), "en", "s", 0L),
      (4L, doc(7, 3, "d"), "en", "s", 0L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = Registry.queries("tdp_budget_select")(spark, dir).collect().head
    assert(r.getLong(0) === 2L, "two docs fit the half-corpus budget")
    assert(r.getLong(1) === 20L, "exactly the budget in tokens")
    assert(r.getLong(2) === 20L, "budget = total / 2")
    assert(math.abs(r.getDouble(4) - 0.5) < 1e-12, "frac_tokens")
  }

  test("cluster-balanced sample keeps the top-2 quality members per IVF cell") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_cbal").toString
    def axis(i: Int): Array[Float] = {
      val a = Array.fill(4)(0.0f); a(i) = 1.0f; a
    }
    // vecs 1,2,3 identical -> one IVF cell (seed = min id 1); vec 4
    // orthogonal -> its own cell. Quality: doc 2 > doc 3 > doc 1.
    val vecs = Seq(
      (1L, axis(0)), (2L, axis(0)), (3L, axis(0)), (4L, axis(1)))
    vecs.toDF("vec_id", "embedding").write.parquet(s"$dir/embeddings.parquet")
    val docs = Seq(
      (1L, "111 222 333 444", "en", "s", 0L), // digits: lowest quality
      (2L, "purewords purewords purewords", "en", "s", 0L), // highest
      (3L, "words with 9 one digit", "en", "s", 0L), // middle
      (4L, "other cell doc", "en", "s", 0L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = Registry.queries("tdp_cluster_balanced_sample")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows.map(_._2) === Set(2L, 3L, 4L),
      s"doc 1 (worst of its cell) is cut, got $rows")
    assert(rows.contains((1L, 2L, 1L)), "cell 1 rank 1 = highest quality doc 2")
    assert(rows.contains((1L, 3L, 2L)), "cell 1 rank 2 = doc 3")
    assert(rows.contains((4L, 4L, 1L)), "singleton cell keeps its only doc")
  }

  test("gopher filters: each rule fails for its planted violator, clean doc keeps") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_gopher").toString
    val clean = "the cat and the dog ran over all nine green hills today"
    val tooShort = "the and cat runs here" // 5 toks < 10
    val longWords = "the and abcdefghijklmnopq rstuvwxyzabcdefgh " +
      "ijklmnopqrstuvwxy zabcdefghijklmnop qrstuvwxyzabcdefg " +
      "hijklmnopqrstuvwx yzabcdefghijklmno pqrstuvwxyzabcdef" // mwl > 10
    val numeric = "the and 11 22 33 44 55 66 77 88" // alpha_frac = 0.2
    val noStops = "cats dogs birds fish mice foxes wolves bears deer elk"
    val docs = Seq((1L, clean), (2L, tooShort), (3L, longWords),
      (4L, numeric), (5L, noStops))
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val rows = Registry.queries("tdp_gopher_filters")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(5), r.getBoolean(6),
        r.getBoolean(7), r.getBoolean(8), r.getBoolean(9)))).toMap
    assert(rows(1L) === ((true, true, true, true, true)), "clean doc keeps")
    assert(!rows(2L)._1 && !rows(2L)._5, "short doc fails r_len")
    assert(!rows(3L)._2 && !rows(3L)._5, "long-word doc fails r_word_len")
    assert(!rows(4L)._3 && !rows(4L)._5, "numeric doc fails r_alpha")
    assert(!rows(5L)._4 && !rows(5L)._5, "stopword-free doc fails r_stop")
  }

  test("length outliers: exact global median/MAD flag only the giant doc") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_lenout").toString
    def words(n: Int, pfx: String): String =
      (1 to n).map(i => s"$pfx$i").mkString(" ")
    // token counts 1..9 plus one 100-token doc: nearest-rank median = 5,
    // deviations {0,1,1,2,2,3,3,4,4,95} -> MAD = 2, threshold 6 -> only
    // the giant doc is an outlier.
    val docs = (1 to 9).map(i => (i.toLong, words(i, s"w$i"))) :+
      (10L, words(100, "g"))
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val r = Registry.queries("tdp_length_outliers")(spark, dir).collect().head
    assert(r.getLong(0) === 10L, "n_docs")
    assert(r.getLong(1) === 5L, "nearest-rank median of 1..9,100")
    assert(r.getLong(2) === 2L, "MAD")
    assert(r.getLong(3) === 1L, "only the 100-token doc exceeds 3 MADs")
    assert(math.abs(r.getDouble(4) - 0.1) < 1e-12, "outlier fraction")
  }

  test("dedup bias profile: kept root with junk scores below dropped clean clones") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_dupprof").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // min-id root 1 carries digit junk (lower quality) and survives
    // dedup; the clean clones 2 and 3 are dropped -> the profile must
    // expose that this dedup pass KEPT the worse copy.
    val docs = Seq(
      (1L, base + " 99999 88888", "en", "s", 0L),
      (2L, base, "en", "s", 0L),
      (3L, base, "en", "s", 0L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = Registry.queries("tdp_quality_dup_profile")(spark, dir)
      .collect()
      .map(r => r.getBoolean(0) -> ((r.getLong(1), r.getDouble(4)))).toMap
    assert(rows(true)._1 === 1L && rows(false)._1 === 2L,
      "one kept root, two dropped members")
    assert(rows(true)._2 < rows(false)._2,
      s"kept mean quality below dropped: $rows")
  }

  test("held-out perplexity: in-distribution val doc beats all-OOV val doc") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_heldout").toString
    // train = ids 1,2 (% 10 != 3); val = ids 3, 13.
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c d"),
      (3L, "a b c d"), // val: every bigram seen in train
      (13L, "x y z w")) // val: every context unseen
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val rows = Registry.queries("tdp_heldout_perplexity")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(3), r.getDouble(4)))).toMap
    assert(rows.keySet === Set(3L, 13L), "only val docs are scored")
    assert(rows(3L)._1 === 3L && rows(3L)._2 === 0L,
      "in-distribution doc has no unseen contexts")
    assert(rows(13L)._2 === 3L, "every context of the OOV doc is unseen")
    assert(rows(3L)._3 > rows(13L)._3,
      s"seen bigrams must outscore unseen: ${rows(3L)} vs ${rows(13L)}")
  }

  test("BPE merge fold: greedy left-to-right, overlap-safe, feedback-safe") {
    import spark.implicits._
    // "aaab" under (a,a): greedy takes positions 0-1, NOT 1-2 -> the
    // leftover 'a' sits in the middle. "abab" under (a,b) merges both
    // non-overlapping sites. A word with no match passes unchanged, and
    // a learned multi-char symbol ("ab") merges again with 'c' to prove
    // round k can consume round k-1's output.
    val rows = Seq("aaab", "abab", "xyz", "abc")
      .toDF("word")
      .withColumn("syms", expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
      .withColumn("m1", TdpQueries.bpeMergeOnce(col("syms"), "a", "a"))
      .withColumn("m2", TdpQueries.bpeMergeOnce(col("syms"), "a", "b"))
      .withColumn("m3", TdpQueries.bpeMergeOnce(
        TdpQueries.bpeMergeOnce(col("syms"), "a", "b"), "ab", "c"))
      .select("word", "m1", "m2", "m3")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getSeq[String](1), r.getSeq[String](2), r.getSeq[String](3))))
      .toMap
    assert(rows("aaab")._1 === Seq("aa", "a", "b"))
    assert(rows("abab")._2 === Seq("ab", "ab"))
    assert(rows("xyz") === ((Seq("x", "y", "z"), Seq("x", "y", "z"),
      Seq("x", "y", "z"))))
    assert(rows("abc")._3 === Seq("abc"),
      s"round-2 merge must consume round-1 symbol: ${rows("abc")}")
  }

  test("BPE merges on a synthetic corpus match hand-computed ranks") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_bpe").toString
    // freq-weighted counts: "low low low" x2 + "lower" -> (l,o)=7,
    // (o,w)=7; tie broken by (a,b) ascending => (l,o) first. After
    // merging (l,o): pairs (lo,w)=7 beat (w,e)=1,(e,r)=1.
    val docs = Seq(
      (1L, "low low low", "en", "s", 0L),
      (2L, "low low low", "en", "s", 0L),
      (3L, "lower", "en", "s", 0L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Registry.queries("tdp_bpe_merges")(spark, dir)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(3), r.getLong(4)))
    // The 6-char vocabulary exhausts after 4 merges (then zero pairs
    // remain) — the loop must STOP, not emit junk rows; the oracle's
    // empty best5/best6 CTEs propagate to the same 4-row result.
    assert(got.toSeq === Seq(
      (1, "lo", 7L), // (l,o)=7 ties (o,w)=7; (l,o) wins ascending
      (2, "low", 7L), // learned 'lo' + w
      (3, "er", 1L), // (e,r) ties (low,e); "e" < "low" bytewise
      (4, "lower", 1L)), s"merge sequence: ${got.toSeq}")
  }

  test("Batched BPE: per-round disjoint greedy picks + slot exhaustion") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_bpe_batch").toString
    // Round 1 pair counts: (l,o)=7, (o,w)=7, (w,e)=1, (e,r)=1.
    // slot 1 takes (l,o) (tie vs (o,w) broken ascending); slot 2 must
    // SKIP (o,w) — shares 'o' with slot 1 — and the (e,r)/(w,e) tie
    // breaks to (e,r); slot 3 finds no pair disjoint from {l,o,e,r} and
    // the round exhausts early. Round 2 (low=[lo,w] x7, lower=[lo,w,er]):
    // slot 1 takes (lo,w)=7, slot 2 exhausts ((w,er) shares 'w').
    val docs = Seq(
      (1L, "low low low", "en", "s", 0L),
      (2L, "low low low", "en", "s", 0L),
      (3L, "lower", "en", "s", 0L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Registry.queries("tdp_bpe_merges_batched")(spark, dir)
      .orderBy("round", "slot").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(4), r.getLong(5)))
    assert(got.toSeq === Seq(
      (1, 1L, "lo", 7L),
      (1, 2L, "er", 1L),
      (2, 1L, "low", 7L)), s"batched merge sequence: ${got.toSeq}")
  }

  test("BPE encode: merges compress the corpus, token count is invariant") {
    val r = Registry.queries("tdp_bpe_encode")(spark, sf).collect()(0)
    val (nWords, nTokens) = (r.getLong(0), r.getLong(1))
    val (before, after, types) = (r.getLong(2), r.getLong(3), r.getLong(4))
    val compression = r.getDouble(5)
    assert(nWords > 0 && nTokens > nWords)
    assert(after < before, s"merges must shrink the corpus: $before -> $after")
    assert(compression === before.toDouble / after.toDouble)
    // 6 merges can add at most 6 symbol types beyond the single chars,
    // and merging must leave at least one multi-char type in use.
    assert(types > 0 && after >= nTokens,
      s"every word is at least one symbol: after=$after tokens=$nTokens")
  }

  test("Zipf fit: planted power-law vocabulary recovers slope ~ -1") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_zipf").toString
    // Tokens t01..t10 with freq = round(1024 / rank): a discrete power
    // law (rounding perturbs ln(freq) by < 0.3%). Token names chosen so
    // the freq-desc/token-asc rank tiebreak is exercised nowhere and the
    // exact global rank equals the planted rank.
    val freqs = (1 to 10).map(r => (f"t$r%02d", math.round(1024.0 / r).toInt))
    val text = freqs.flatMap { case (t, n) => Seq.fill(n)(t) }.mkString(" ")
    Seq((1L, text)).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val r = Registry.queries("tdp_zipf_fit")(spark, dir).collect()(0)
    assert(r.getLong(0) === 10L, "vocab_size")
    val (slope, r2) = (r.getDouble(1), r.getDouble(3))
    assert(slope < -0.9 && slope > -1.1, s"slope=$slope")
    assert(r2 > 0.99, s"r2=$r2")
  }

  test("Token entropy: uniform corpus hits the ln(V) maximum, ppl ~ V") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_entropy").toString
    val v = 64
    val text = (1 to v).map(i => f"w$i%03d").mkString(" ")
    Seq((1L, text)).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val r = Registry.queries("tdp_token_entropy")(spark, dir).collect()(0)
    assert(r.getLong(0) === v.toLong && r.getLong(1) === v.toLong)
    val (h, ppl) = (r.getDouble(2), r.getDouble(3))
    val hMax = math.log(v.toDouble)
    // uniform is the entropy maximum; per-type micro-nat flooring can
    // lose at most 1e-6 nats per vocabulary entry below it
    assert(h <= hMax + 1e-9 && h >= hMax - v * 1e-6, s"h=$h vs ln(V)=$hMax")
    assert(math.abs(ppl - v) < 0.01, s"perplexity=$ppl")
  }

  test("Detector ensemble: counts obey inclusion-exclusion and bounds") {
    val r = Registry.queries("tdp_dedup_agreement")(spark, sf).collect()(0)
    val c = (0 to 8).map(r.getLong)
    val (nExact, mhHit, shHit, bothHit, anyHit) = (c(0), c(1), c(2), c(3), c(4))
    val (missed, mhCand, shCand, candShared) = (c(5), c(6), c(7), c(8))
    val recall = r.getDouble(9)
    assert(nExact > 0, "sf0.001 ground truth must be non-empty")
    assert(anyHit === mhHit + shHit - bothHit, "inclusion-exclusion")
    assert(missed === nExact - anyHit && missed >= 0)
    assert(bothHit <= math.min(mhHit, shHit))
    assert(mhHit <= mhCand && shHit <= shCand,
      "a detector cannot hit more truth pairs than it emitted candidates")
    assert(candShared <= math.min(mhCand, shCand))
    assert(recall === anyHit.toDouble / nExact)
  }

  test("batched BPE at K=1 reproduces the sequential learner exactly") {
    // The batched learner's documented deviation from Sennrich's argmax
    // (slots 2..K count against the round-start snapshot) must vanish at
    // K=1: one merge per round IS the sequential algorithm, so the merge
    // table — symbols, order, and counts — must be identical.
    val sequential = Registry.queries("tdp_bpe_merges")(spark, sf)
      .orderBy("rank").collect()
      .map(r => (r.getAs[String]("sym_a"), r.getAs[String]("sym_b"),
        r.getAs[Long]("pair_count"))).toSeq
    val batchedK1 = TdpQueries.bpeLearnBatched(spark, sf, sequential.size, 1)
      .map { case (_, slot, a, b, cnt) => assert(slot == 1); (a, b, cnt) }
    assert(batchedK1 == sequential,
      s"K=1 batch diverged:\n  batched=$batchedK1\n  sequential=$sequential")
  }

  test("substring dedup: spans are maximal, witnessed, and evidence-backed") {
    val spans = Registry.queries("tdp_substring_dedup")(spark, sf).collect()
    assert(spans.nonEmpty, "sf0.001 must contain cross-doc repeated spans")
    val docToks = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").split("\\s+").filter(_.nonEmpty).toSeq).toMap
    val W = 8
    val byDoc = spans.groupBy(_.getAs[Long]("doc_id"))
    spans.foreach { r =>
      val (doc, start, len, nw) = (r.getAs[Long]("doc_id"),
        r.getAs[Long]("start_tok"), r.getAs[Long]("span_toks"),
        r.getAs[Long]("n_windows"))
      val witness = r.getAs[Long]("witness_doc")
      assert(len >= W && nw == len - W + 1, s"span arithmetic broken: $r")
      assert(witness != doc, s"span must be witnessed by ANOTHER doc: $r")
      // The span text must be exactly the claimed slice of the document.
      val expected =
        docToks(doc).slice(start.toInt - 1, (start + len - 1).toInt)
          .mkString(" ")
      assert(r.getAs[String]("span_text") == expected)
      // Evidence: at least one W-token window of the span occurs verbatim
      // in the witness document (the witness is the min over per-window
      // witnesses, so it shares at least one window).
      val spanToks = docToks(doc).slice(start.toInt - 1, (start + len - 1).toInt)
      val wWindows = docToks(witness).sliding(W).map(_.mkString(" ")).toSet
      assert(spanToks.sliding(W).exists(w => wWindows.contains(w.mkString(" "))),
        s"witness $witness shares no window of doc $doc span at $start")
    }
    // Maximality: islands within a doc are separated in window space
    // (adjacent shared windows always merge into one span).
    byDoc.values.foreach { ss =>
      val sorted = ss.sortBy(_.getAs[Long]("start_tok"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("start_tok") >
            a.getAs[Long]("start_tok") + a.getAs[Long]("n_windows"),
            s"adjacent islands failed to merge: $a | $b")
        case _ =>
      }
    }
  }

  test("profile: planted nulls/distincts/extremes per column") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_profile").toString
    Seq(
      (1L, "aa bb", "en", "s1", 5L),
      (2L, "aa bb", null.asInstanceOf[String], "s1", 5L),
      (3L, "cc", "de", "s2", 2L),
      (4L, "dd ee ff", "de", "s2", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = Registry.queries("tdp_profile")(spark, dir).collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    assert(rows.keySet == Set("doc_id", "text", "lang", "source", "n_chars"))
    rows.values.foreach(r => assert(r.getAs[Long]("n_rows") == 4L))
    val lang = rows("lang")
    assert(lang.getAs[Long]("n_null") == 1L)
    assert(lang.getAs[Long]("n_distinct") == 2L) // null excluded
    assert(lang.getAs[String]("min_val") == "de" &&
      lang.getAs[String]("max_val") == "en")
    val id = rows("doc_id")
    assert(id.getAs[Long]("n_null") == 0L &&
      id.getAs[Long]("n_distinct") == 4L)
    assert(id.getAs[String]("min_val") == "1" &&
      id.getAs[String]("max_val") == "4")
    assert(rows("text").getAs[Long]("n_distinct") == 3L) // "aa bb" twice
    assert(rows("n_chars").getAs[String]("max_val") == "8")
  }

  test("k-anonymity: generalizing merges risky groups away") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_kanon").toString
    // nation 1 x AUTO has 7 members (safe); nations 2 and 3 x BIKE have
    // 2 and 3 members (risky at k=5) but generalize to one BIKE group
    // of 5 (exactly k, safe).
    val rows = (1 to 7).map(i => (1, "AUTO")) ++
      (1 to 2).map(_ => (2, "BIKE")) ++ (1 to 3).map(_ => (3, "BIKE"))
    rows.toDF("c_nationkey", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    val out = Registry.queries("tdp_k_anonymity")(spark, dir).collect()
      .map(r => r.getAs[String]("level") -> r).toMap
    val fine = out("nation+segment")
    assert(fine.getAs[Long]("n_groups") == 3L)
    assert(fine.getAs[Long]("k_attained") == 2L)
    assert(fine.getAs[Long]("risky_groups") == 2L)
    assert(fine.getAs[Long]("risky_rows") == 5L)
    val coarse = out("segment")
    assert(coarse.getAs[Long]("n_groups") == 2L)
    assert(coarse.getAs[Long]("k_attained") == 5L)
    assert(coarse.getAs[Long]("risky_groups") == 0L)
    assert(coarse.getAs[Long]("risky_rows") == 0L)
  }

  test("vocab coverage: planted head mass yields exact permilles") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_vocab_cov").toString
    // Tokens t01..t15 with counts 15..1 -> total 120; top-10 by count
    // covers 15+14+...+6 = 105 -> 875 permille; top-100 covers all.
    val text = (1 to 15)
      .flatMap(i => Seq.fill(16 - i)(f"t$i%02d")).mkString(" ")
    Seq((1L, text)).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val rows = Registry.queries("tdp_vocab_coverage")(spark, dir).collect()
      .map(r => r.getAs[Int]("vocab_size") -> r).toMap
    assert(rows(10).getAs[Long]("covered_occurrences") == 105L)
    assert(rows(10).getAs[Long]("total_occurrences") == 120L)
    assert(rows(10).getAs[Long]("coverage_permille") == 875L)
    assert(rows(100).getAs[Long]("coverage_permille") == 1000L)
    assert(rows(1000).getAs[Long]("covered_occurrences") == 120L)
  }

  test("kfold: folds partition the corpus and shares sum to ~1000") {
    val rows = Registry.queries("tdp_kfold")(spark, sf).collect()
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("fold")).toSet.subsetOf(Set(0L, 1L, 2L, 3L, 4L)))
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total,
      "every doc lands in exactly one fold")
    val shareSum = rows.map(_.getAs[Long]("share_permille")).sum
    assert(shareSum <= 1000L && shareSum >= 1000L - rows.length,
      s"floor permilles must sum to (1000 - #folds, 1000], got $shareSum")
  }

  test("collocations: a welded pair scores high PMI, independents near zero") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_colloc").toString
    // "new york" appears as a unit 8 times among 8 distinct one-off
    // filler contexts; "the cat" co-occurs but each word also appears
    // apart, diluting its PMI. Bigrams seen < 5 times must not appear.
    val docs = (0 until 8).map { i =>
      (i.toLong, s"new york f$i the cat the dog cat nap")
    }
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val out = Registry.queries("tdp_collocations")(spark, dir).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2")) -> r).toMap
    assert(out.contains(("new", "york")))
    val ny = out(("new", "york"))
    assert(ny.getAs[Long]("c_xy") == 8L)
    // every "new" is followed by "york" and both only occur welded:
    // pmi = ln(N * 8 / (8 * 8)) = ln(8) for N = 8 docs x 8 bigrams = 64.
    assert(ny.getAs[Long]("pmi_micro") > 0L)
    val tc = out(("the", "cat"))
    // "the" occurs 16x, "cat" 16x, "the cat" 8x, N = 64:
    // pmi = ln(64*8/256) = ln(2) -> positive but far below ln(8).
    assert(tc.getAs[Long]("pmi_micro") < ny.getAs[Long]("pmi_micro"))
    // no bigram below the min-count floor of 5:
    assert(out.values.forall(_.getAs[Long]("c_xy") >= 5L))
  }

  test("uniform sample: deterministic bottom-k-by-hash subset of the corpus") {
    val s1 = Registry.queries("tdp_uniform_sample")(spark, sf).collect()
    val s2 = Registry.queries("tdp_uniform_sample")(spark, sf).collect()
    assert(s1.length == 100)
    assert(s1.map(_.getAs[Long]("doc_id")).toSeq ==
      s2.map(_.getAs[Long]("doc_id")).toSeq, "same seed -> same sample")
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1.map(_.getAs[Long]("doc_id")).forall(corpus.contains))
    assert(s1.map(_.getAs[Long]("doc_id")).distinct.length == 100,
      "sampling is without replacement")
    // Uniformity guard against the under-wrapped-polyhash bias (which
    // sampled ALL ten 1-digit ids): no short-id length class may be
    // swept in wholesale.
    val small = s1.map(_.getAs[Long]("doc_id")).count(_ < 10)
    assert(small < 10, s"$small of the ten 1-digit ids sampled — length bias")
  }

  test("containment: a nested doc is caught where symmetric Jaccard misses") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_contain").toString
    val inner = (1 to 20).map(i => s"w$i").mkString(" ")
    val tail = (100 to 180).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, inner), // 18 shingles, all inside doc 2
      (2L, s"$inner $tail"), // the container
      (3L, (200 to 260).map(i => s"w$i").mkString(" "))) // unrelated
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val out = Registry.queries("tdp_containment")(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r).toMap
    assert(out.contains((1L, 2L)), s"nested doc must be flagged, got $out")
    val c = out((1L, 2L))
    assert(c.getAs[Double]("containment") == 1.0,
      "every shingle of the inner doc occurs in the container")
    // the symmetric direction stays below threshold (the container is
    // NOT contained in the small doc) and unrelated docs don't pair:
    assert(!out.contains((2L, 1L)))
    assert(!out.keySet.exists { case (a, b) => a == 3L || b == 3L })
    // and the Jaccard sweep would NOT have caught this pair at >= 0.5:
    val jac = c.getAs[Long]("inter").toDouble /
      (c.getAs[Int]("na") + c.getAs[Int]("nb") - c.getAs[Long]("inter"))
    assert(jac < 0.5, s"planted pair must be jaccard-invisible, j=$jac")
  }

  test("compaction plan: bins partition the file list and fill the target") {
    val bins = Registry.queries("tdp_compaction_plan")(spark, sf).collect()
    val files = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id div 50 AS f", "n_chars")
      .groupBy("f").count().count()
    assert(bins.map(_.getAs[Long]("n_files")).sum == files,
      "every file lands in exactly one bin")
    val target = bins.head.getAs[Long]("target_bytes")
    val ids = bins.map(_.getAs[Long]("bin")).sorted
    assert(ids.head == 0L && ids.last == ids.length - 1,
      s"bins must be contiguous from 0, got ${ids.toSeq}")
    val total = bins.map(_.getAs[Long]("bytes_total")).sum
    assert(total / target <= ids.length && ids.length <= 9,
      s"8-way target split must yield <= 9 bins, got ${ids.length}")
  }

  test("label centroids: clone labels cohere, orthogonal labels separate") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_labelcent").toString
    // labels 0 and 2 point along e1 (2 vectors each, tiny jitter in a
    // DIFFERENT dimension so nothing is degenerate), label 1 along e2.
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.01f), 0),
      (2L, Array(1.0f, 0.0f, 0.02f), 0),
      (3L, Array(0.0f, 1.0f, 0.01f), 1),
      (4L, Array(0.0f, 1.0f, 0.02f), 1),
      (5L, Array(1.0f, 0.0f, 0.015f), 2),
      (6L, Array(1.0f, 0.0f, 0.025f), 2))
    vecs.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = Registry.queries("tdp_label_centroid_sim")(spark, dir).collect()
      .map(r => (r.getAs[Int]("label_a"), r.getAs[Int]("label_b")) ->
        r.getAs[Double]("cos_sim")).toMap
    assert(out.keySet == Set((0, 1), (0, 2), (1, 2)))
    assert(out((0, 2)) > 0.999, s"clone labels must cohere: ${out((0, 2))}")
    assert(out((0, 1)) < 0.1, s"orthogonal labels must separate: ${out((0, 1))}")
  }

  test("pagerank: hand-computed fixpoints on a planted clique + pair graph") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_pr").toString
    // 4 exact clones -> LSH clique K4 (deg 3 each); 2 unrelated clones
    // -> a single edge (deg 1 each). Both structures are symmetric, so
    // PR is computable by hand in exact integer arithmetic:
    //   K4:   p1 = 150000 + 85 * (3 * (1000000 div 3)) div 100 = 999999,
    //         then 999999 div 3 = 333333 regenerates 999999 — fixpoint.
    //   pair: p1 = 150000 + 85 * 1000000 div 100 = 1000000 — fixpoint.
    val cliqueText = "alpha beta gamma delta epsilon zeta eta theta iota"
    val pairText = "one two three four five six seven eight nine ten"
    val docs = (0L until 4L).map((_, cliqueText)) ++
      Seq((10L, pairText), (11L, pairText))
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val pr = Registry.queries("tdp_pagerank")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("deg"), r.getAs[Long]("pr_micro"))).toMap
    assert(pr.keySet == (0L until 4L).toSet ++ Set(10L, 11L))
    (0L until 4L).foreach { d =>
      assert(pr(d) == ((3L, 999999L)), s"clique node $d: ${pr(d)}")
    }
    Seq(10L, 11L).foreach { d =>
      assert(pr(d) == ((1L, 1000000L)), s"pair node $d: ${pr(d)}")
    }
  }

  test("curation funnel: planted attrition at every stage boundary") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_funnel").toString
    val base = "the quick brown fox and the lazy dog ran over a hill to " +
      "find that good water was in the old well by the barn"
    val docs = Seq(
      (1L, base), // survives everything (cluster root)
      (2L, base), // exact clone -> dies at exact-dedup
      (3L, s"$base again"), // near-dup -> dies at near-dup collapse
      (4L, "9999 8888 %%% 7777 $$$ 6666 !!!"), // junk -> dies at quality
      (5L, "independent clean text about a completely different topic " +
        "that the filter keeps and the dedup never touches"))
    docs.map { case (id, t) => (id, t, "en", "s1", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = Registry.queries("tdp_curation_funnel")(spark, dir).collect()
      .map(r => r.getAs[String]("stage") ->
        (r.getAs[Long]("docs_in"), r.getAs[Long]("docs_out"),
          r.getAs[Long]("docs_dropped"))).toMap
    assert(rows("1_quality") == ((5L, 4L, 1L)), s"quality: ${rows("1_quality")}")
    assert(rows("2_exact_dedup") == ((4L, 3L, 1L)),
      s"exact: ${rows("2_exact_dedup")}")
    assert(rows("3_near_dup") == ((3L, 2L, 1L)), s"near: ${rows("3_near_dup")}")
  }

  test("filtered ANN: counts cohere and recall is the exact ratio") {
    val r = Registry.queries("tdp_ann_filtered")(spark, sf).collect().head
    val (ne, nc, nh) = (r.getAs[Long]("n_exact"),
      r.getAs[Long]("n_candidates"), r.getAs[Long]("n_hit"))
    val nQueries = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") % 50 === 0).count()
    assert(ne > 0 && ne <= 3 * nQueries, s"exact truth bound: $ne")
    assert(nc <= 3 * nQueries, // rank <= 3 over the union of both probes
      s"candidate bound: $nc")
    assert(nh <= math.min(ne, nc), s"hits bound: $nh vs ($ne, $nc)")
    assert(r.getAs[Double]("recall") == nh.toDouble / ne.toDouble)
  }

  test("join size estimate: one-sided guarantee over the real shingle join") {
    val r = Registry.queries("tdp_join_size_est")(spark, sf).collect()
    assert(r.length == 1)
    val (ne, nEst, over) = (r.head.getAs[Long]("n_exact"),
      r.head.getAs[Long]("n_est"), r.head.getAs[Long]("overestimate"))
    assert(ne > 0, "fixture join must be non-empty")
    assert(nEst >= ne, s"CMS dot $nEst under-counts exact join size $ne")
    assert(over == nEst - ne)
    assert(r.head.getAs[Double]("over_ratio") == nEst.toDouble / ne.toDouble)
  }

  test("grouped top-n matches the window formulation on the corpus") {
    import org.apache.spark.sql.expressions.Window
    val viaAgg = Registry.queries("tdp_topk_per_group")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(2))).toMap
    val w = Window.partitionBy("source").orderBy(desc("n_chars"), col("doc_id"))
    val viaWindow = Registry.table(spark, sf, "documents")
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .groupBy("source")
      .agg(expr("array_join(transform(" +
        "array_sort(collect_list(struct(rk, doc_id, n_chars)))," +
        " x -> concat(x.doc_id, ':', x.n_chars)), '|')").as("top_docs"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(viaAgg == viaWindow)
  }

  test("weighted sample: k rows, floor at own weight, estimator coherent") {
    val rows = Registry.queries("tdp_weighted_sample")(spark, sf).collect()
    assert(rows.length == 50)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == 50)
    rows.foreach { r =>
      // w_hat = max(w, tau) can never fall below the item's own weight.
      assert(r.getAs[Long]("w_hat_mu") >= r.getAs[Long]("w") * 1000000L)
    }
    val est = rows.map(_.getAs[Long]("est_total_mu")).distinct
    val exact = rows.map(_.getAs[Long]("exact_total")).distinct
    assert(est.length == 1 && exact.length == 1,
      "summary columns must be constant across the sample")
    // Priority sampling with k=50 over this corpus: the estimator should
    // land well within an order of magnitude (tight bounds are
    // distributional; the oracle certifies exact replication).
    val relErr = math.abs(est.head / 1e6 - exact.head) / exact.head
    assert(relErr < 0.5, s"rel_err $relErr implausibly large for k=50")
  }

  test("hard negatives: every mined pair crosses labels, ranked by sim") {
    val negs = Registry.queries("tdp_hard_negatives")(spark, sf).collect()
    assert(negs.nonEmpty)
    val labels = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    negs.foreach { r =>
      val (q, n) = (r.getAs[Long]("q_id"), r.getAs[Long]("neg_id"))
      assert(labels(q) != labels(n), s"($q, $n) share label ${labels(q)}")
      assert(r.getAs[Int]("rank") >= 1 && r.getAs[Int]("rank") <= 3)
    }
    // Within a query, rank order must follow descending similarity.
    negs.groupBy(_.getAs[Long]("q_id")).values.foreach { rs =>
      val bySim = rs.sortBy(r => (-r.getAs[Double]("sim"), r.getAs[Long]("neg_id")))
      assert(bySim.map(_.getAs[Int]("rank")).toSeq == (1 to rs.length))
    }
  }

  test("skew profile: aggregate invariants over the events key") {
    val r = Registry.queries("tdp_skew_profile")(spark, sf).collect().head
    val nRows = spark.read.parquet(s"$sf/events.parquet").count()
    assert(r.getAs[Long]("n_rows") == nRows)
    assert(r.getAs[Long]("max_df") >= math.ceil(r.getAs[Double]("avg_df")).toLong - 1)
    val hhi = r.getAs[Double]("hhi")
    assert(hhi >= 1.0 / r.getAs[Long]("n_keys") - 1e-12 && hhi <= 1.0)
    assert(r.getAs[Long]("recommended_salts") >= 1L)
    assert(r.getAs[Double]("top10_share") <= 1.0)
  }

  test("shuffle quality: hash permutation mixes sources near the ideal rate") {
    val r = Registry.queries("tdp_shuffle_quality")(spark, sf).collect().head
    assert(r.getAs[Long]("n_pairs") > 0)
    val ratio = r.getAs[Double]("mix_ratio")
    // A broken permutation (e.g. sorted by source) drives this toward
    // 1/expected_rate >> 1; a correct hash order sits near 1.
    assert(ratio > 0.5 && ratio < 2.0, s"mix_ratio $ratio")
  }

  test("SCD2: change compression keeps only transitions, intervals chain") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_scd2").toString
    // user 1: A A B B A -> versions A[10,30) B[30,50) A[50,-1);
    // user 2: single event -> one open version.
    val ev = Seq(
      (1L, 10L * 1000000000L, 1L, "A"), (2L, 20L * 1000000000L, 1L, "A"),
      (3L, 30L * 1000000000L, 1L, "B"), (4L, 40L * 1000000000L, 1L, "B"),
      (5L, 50L * 1000000000L, 1L, "A"), (6L, 70L * 1000000000L, 2L, "Z"))
    ev.toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(s"$dir/events.parquet")
    val got = Registry.queries("tdp_scd2_history")(spark, dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("version"),
        r.getAs[String]("event_type"), r.getAs[Long]("valid_from"),
        r.getAs[Long]("valid_to"), r.getAs[Boolean]("is_current"))).toSet
    assert(got == Set(
      (1L, 1, "A", 10L, 30L, false),
      (1L, 2, "B", 30L, 50L, false),
      (1L, 3, "A", 50L, -1L, true),
      (2L, 1, "Z", 70L, -1L, true)), got)
  }

  test("tokenizer fertility: every word >= 1 token, every token >= 1 char") {
    val rows = Registry.queries("tdp_tokenizer_fertility")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("fertility") >= 1.0,
        s"${r.get(0)}: fertility < 1")
      assert(r.getAs[Double]("chars_per_token") >= 1.0,
        s"${r.get(0)}: chars_per_token < 1")
      assert(r.getAs[Long]("n_tokens") >= r.getAs[Long]("n_words"))
      assert(r.getAs[Long]("n_chars") >= r.getAs[Long]("n_tokens"))
    }
  }

  test("image phash: planted 192-period clones pair at hamming 0") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_phash").toString
    // ids 7, 199, 391 are exact perceptual clones (period 192); 8 is not.
    Seq(7L, 199L, 391L, 8L).toDF("doc_id")
      .withColumn("text", lit("x"))
      .write.parquet(s"$dir/documents.parquet")
    val pairs = Registry.queries("tdp_image_phash")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val zeros = pairs.filter(_._3 == 0).map(p => (p._1, p._2)).toSet
    assert(Set((7L, 199L), (7L, 391L), (199L, 391L)).subsetOf(zeros),
      s"clone pairs missing from $zeros")
    assert(pairs.forall(_._3 <= 3))
  }

  test("embedding drift: one row per dimension, drift is the mean gap") {
    val rows = Registry.queries("tdp_embedding_drift")(spark, sf).collect()
    val dims = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("size(embedding) AS d").head().getInt(0)
    assert(rows.length == dims)
    rows.foreach { r =>
      val (a, b, d) = (r.getAs[Double]("mean_a"), r.getAs[Double]("mean_b"),
        r.getAs[Double]("abs_drift"))
      assert(!a.isNaN && !b.isNaN)
      assert(math.abs(d - math.abs(a - b)) < 1e-9, s"dim ${r.get(0)}")
    }
  }

  test("length batching: buckets are powers of two, accounting closes") {
    val rows = Registry.queries("tdp_length_batching")(spark, sf).collect()
    assert(rows.nonEmpty)
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    val corpus = Registry.table(spark, sf, "documents")
      .selectExpr("size(filter(split(text, '\\\\s+'), x -> x != '')) AS n")
      .filter(col("n") > 0).count()
    assert(nDocs == corpus)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 16 && (b & (b - 1)) == 0, s"bucket $b not a power of two")
      assert(r.getAs[Long]("padded_tokens") >= r.getAs[Long]("n_tokens"))
      val w = r.getAs[Double]("waste_ratio")
      assert(w >= 0.0 && w < 1.0)
      assert(r.getAs[Long]("n_batches") >= 1L)
    }
  }

  test("benford: digit law accounting over the price column") {
    val rows = Registry.queries("tdp_benford")(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("digit")).toSet.subsetOf((1 to 9).toSet))
    val nTotal = rows.map(_.getAs[Long]("n_obs")).sum
    assert(nTotal == spark.read.parquet(s"$sf/lineitem.parquet").count())
    rows.foreach { r =>
      assert(r.getAs[Double]("chi2_component") >= 0.0)
      assert(r.getAs[Double]("n_expected") > 0.0)
    }
    // TPC-H prices are roughly uniform in magnitude, not Benford —
    // the audit should therefore FLAG them (large chi2), proving the
    // metric isn't vacuously near zero on non-conforming data.
    assert(rows.map(_.getAs[Double]("chi2_component")).sum > 100.0)
  }

  test("ANN ranking metrics: bounded in [0, 1] and consistent with recall") {
    val r = Registry.queries("tdp_ann_ranking_metrics")(spark, sf)
      .collect().head
    val (mrr, ndcg) = (r.getAs[Double]("mrr"), r.getAs[Double]("ndcg_at_3"))
    assert(mrr >= 0.0 && mrr <= 1.0, s"mrr $mrr")
    assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-9, s"ndcg $ndcg")
    assert(r.getAs[Long]("n_queries") > 0)
    assert(r.getAs[Long]("n_scored") <= r.getAs[Long]("n_queries"))
    // Some query must place its true NN (the fixture's recall is ~0.23
    // at 64 clusters over 500 vectors — small but non-zero).
    assert(mrr > 0.0 && ndcg > 0.0)
    // Algebraic coupling: a found true-NN contributes at most 1e6 to the
    // RR sum but at least 500000 to the DCG sum, so
    // mrr <= ndcg * (2 * 2130930 / 1e6).
    assert(mrr <= ndcg * 4.26186 + 1e-9, s"mrr $mrr vs ndcg $ndcg")
  }

  test("label noise: verdicts cover the query subset, flags are consistent") {
    val rows = Registry.queries("tdp_label_noise")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val agree = r.getAs[Long]("n_agree")
      assert(agree >= 1L && agree <= 3L)
      assert(r.getAs[Boolean]("is_suspect") ==
        (r.get(1) != r.get(2)), s"row $r")
    }
  }

  test("l-diversity: attained l bounded by group sizes, exposure coherent") {
    val rows = Registry.queries("tdp_l_diversity")(spark, sf).collect()
      .map(r => r.getAs[String]("level") -> r).toMap
    assert(rows.keySet == Set("nation+segment", "segment"))
    rows.values.foreach { r =>
      assert(r.getAs[Long]("l_attained") >= 1L)
      assert(r.getAs[Long]("weak_groups") <= r.getAs[Long]("n_groups"))
    }
    // Coarser QI groups can only be MORE diverse: fewer, larger groups.
    assert(rows("segment").getAs[Long]("l_attained") >=
      rows("nation+segment").getAs[Long]("l_attained"))
  }

  test("audio fingerprint: exact-dup flags coincide with the 96-period") {
    val pairs = Registry.queries("tdp_audio_fingerprint")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Boolean]("is_exact_dup")))
    assert(pairs.nonEmpty)
    // Byte-identical PCM requires identical (n, slope, phase) — i.e. the
    // ids agree mod 96; a fingerprint collision alone must NOT flag.
    pairs.filter(_._3).foreach { case (a1, b1, _) =>
      assert((b1 - a1) % 96 == 0, s"flagged non-clone pair ($a1, $b1)")
    }
    // And the planted clones DO surface with the flag set.
    assert(pairs.exists { case (a1, b1, d) => d && (b1 - a1) % 96 == 0 })
  }

  test("epoch shard: cross-epoch carryover sits at the independent-hash rate") {
    val rows = Registry.queries("tdp_epoch_shard")(spark, sf).collect()
    val n = rows.map(_.getAs[Long]("n_docs")).sum
    val same = rows.map(_.getAs[Long]("n_same_next_epoch")).sum
    // Ideal = n/8; the affine-hash bug this guards against measured 0.
    assert(same > n / 16 && same < n / 4,
      s"carryover $same of $n docs — epochs not independent")
  }

  test("incremental near-dup: batch clone probes the index, novelty stays out") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_incr_nd").toString
    val cloneText = "alpha beta gamma delta epsilon zeta eta theta iota"
    // id 7 is batch (7 % 10 = 7) and a clone of indexed id 0; id 17 is
    // batch with unique content; ids 0/2 are the index.
    val docs = Seq((0L, cloneText), (2L, "one two three four five six seven"),
      (7L, cloneText), (17L, "totally different words appear in this doc"))
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = Registry.queries("tdp_incremental_neardup")(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getAs[Long]("n_sig_agree"), r.getAs[Double]("est_jaccard")))).toMap
    assert(got.keySet == Set((7L, 0L)), s"pairs: ${got.keySet}")
    assert(got((7L, 0L)) == ((8L, 1.0)), "clone must agree on all 8 permutations")
  }

  test("freshness decay: shares normalize, weights bounded by recency") {
    val rows = Registry.queries("tdp_freshness_decay")(spark, sf).collect()
    assert(rows.nonEmpty)
    val shareSum = rows.map(_.getAs[Double]("decayed_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-9, s"shares sum to $shareSum")
    rows.foreach { r =>
      // Decayed mass can never exceed full (undecayed) mass.
      assert(r.getAs[Long]("decayed_mass_mu") <=
        r.getAs[Long]("n_events") * 1000000L)
    }
  }

  test("grouped quantiles: bounds hold for every (group, percentile)") {
    val rows = Registry.queries("tdp_grouped_quantiles")(spark, sf).collect()
    val nLangs = Registry.table(spark, sf, "documents")
      .select("lang").distinct().count()
    assert(rows.length == 2 * nLangs, s"${rows.length} rows for $nLangs langs")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("bounds_hold"),
        s"${r.get(0)} p=${r.get(1)}: exact ${r.get(5)} outside " +
          s"[${r.get(3)}, ${r.get(4)}]")
    }
  }

  test("dataset card: per-language accounting closes against the corpus") {
    val rows = Registry.queries("tdp_dataset_card")(spark, sf).collect()
    val nDocs = Registry.table(spark, sf, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    rows.foreach { r =>
      val q = r.getAs[Double]("mean_quality")
      assert(q > 0.0 && q <= 1.0, s"${r.get(0)}: mean_quality $q")
      val d = r.getAs[Double]("dup_rate")
      assert(d >= 0.0 && d <= 1.0)
      assert(r.getAs[Long]("top_source_docs") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_tokens") >= r.getAs[Long]("n_docs"))
    }
  }

  test("text normalize: pipeline is idempotent and retention bounded") {
    val r = Registry.queries("tdp_text_normalize")(spark, sf).collect().head
    assert(r.getAs[Long]("n_unstable") == 0L,
      "normalization must be idempotent")
    assert(r.getAs[Long]("chars_out") <= r.getAs[Long]("chars_in"))
    val ret = r.getAs[Double]("retention")
    assert(ret > 0.0 && ret <= 1.0)
  }

  test("context windows: overlap accounting matches the closed form") {
    val rows = Registry.queries("tdp_context_windows")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("emitted_tokens") >= r.getAs[Long]("fresh_tokens"))
      assert(r.getAs[Long]("overlap_tokens") ==
        r.getAs[Long]("emitted_tokens") - r.getAs[Long]("fresh_tokens"))
      // With W=32, S=24 each extra window re-reads exactly 8 tokens.
      assert(r.getAs[Long]("overlap_tokens") ==
        (r.getAs[Long]("n_windows") - r.getAs[Long]("n_docs")) * 8)
    }
  }

  test("schema drift: identical-feed split reports a stable contract shape") {
    val rows = Registry.queries("tdp_schema_drift")(spark, sf).collect()
    assert(rows.map(_.getAs[String]("column_name")).toSet ==
      Set("value", "user_id", "sec"))
    rows.foreach { r =>
      assert(r.getAs[Long]("rows_a") + r.getAs[Long]("rows_b") ==
        spark.read.parquet(s"$sf/events.parquet").count())
      assert(r.getAs[Long]("null_a") >= 0 && r.getAs[Long]("null_b") >= 0)
    }
  }

  test("LM rollout: the walk is a real bigram chain from the top token") {
    val rows = Registry.queries("tdp_lm_rollout")(spark, sf).collect()
      .sortBy(_.getAs[Int]("step"))
    assert(rows.length >= 2 && rows.length <= 7)
    assert(rows.head.getAs[Int]("step") == 0)
    val topTok = Registry.table(spark, sf, "documents")
      .selectExpr("explode(filter(split(text, '\\\\s+'), x -> x != '')) AS t")
      .groupBy("t").count().orderBy(desc("count"), col("t"))
      .head().getString(0)
    assert(rows.head.getAs[String]("token") == topTok)
    // Every consecutive pair in the emitted walk must be an observed
    // bigram with the claimed count.
    val bigrams = Registry.table(spark, sf, "documents")
      .selectExpr("filter(split(text, '\\\\s+'), x -> x != '') AS toks")
      .selectExpr("explode(CASE WHEN size(toks) >= 2 THEN " +
        "transform(sequence(1, size(toks) - 1), i -> " +
        "struct(element_at(toks, i) AS a, element_at(toks, i + 1) AS b)) " +
        "ELSE array() END) AS bg")
      .groupBy("bg.a", "bg.b").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    rows.sliding(2).foreach {
      case Array(prev, next) =>
        val key = (prev.getAs[String]("token"), next.getAs[String]("token"))
        assert(bigrams.get(key).contains(next.getAs[Long]("cnt")),
          s"step ${next.get(0)}: $key not an observed bigram with that count")
      case _ =>
    }
  }

  test("silhouette: covers every vector once, means bounded in [0, 1]") {
    val rows = Registry.queries("tdp_silhouette")(spark, sf).collect()
    val nVecs = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(rows.map(_.getAs[Long]("n_points")).sum == nVecs,
      "every vector contributes to exactly one cluster's silhouette")
    rows.foreach { r =>
      val m = r.getAs[Double]("mean_sil")
      assert(m >= 0.0 && m <= 1.0, s"cluster ${r.get(0)}: mean_sil $m")
    }
  }

  test("triangle count: planted clique triangulates, planted edge does not") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_tri").toString
    // Three clones -> 3 LSH pairs -> one triangle; two clones -> one
    // edge, no triangle. Each clique vertex: deg 2, 1 triangle,
    // cc = 2000*1 div (2*1) = 1000 permille (a closed neighborhood).
    val clique = "alpha beta gamma delta epsilon zeta eta theta"
    val edge = "one two three four five six seven eight nine"
    val docs = Seq((1L, clique), (2L, clique), (3L, clique),
      (10L, edge), (11L, edge))
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = Registry.queries("tdp_triangle_count")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("deg"), r.getAs[Long]("triangles"),
          r.getAs[Long]("cc_permille"))))
      .toMap
    Seq(1L, 2L, 3L).foreach { v =>
      assert(got(v) == ((2L, 1L, 1000L)), s"clique vertex $v: ${got(v)}")
    }
    Seq(10L, 11L).foreach { v =>
      assert(got(v) == ((1L, 0L, 0L)), s"edge vertex $v: ${got(v)}")
    }
  }

  test("pareto frontier: result is internally non-dominated and non-empty") {
    val rows = Registry.queries("tdp_pareto_frontier")(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_micro"), r.getAs[Long]("n_toks"),
        r.getAs[Long]("lexdiv_permille")))
    assert(rows.nonEmpty, "skyline of a non-empty corpus is non-empty")
    // Skyline definition: no member may dominate another member.
    for (p <- rows; q <- rows if p != q) {
      val dom = q._1 >= p._1 && q._2 >= p._2 && q._3 >= p._3 &&
        (q._1 > p._1 || q._2 > p._2 || q._3 > p._3)
      assert(!dom, s"skyline member $q dominates member $p")
    }
    // (The cross-corpus guarantee — nothing OUTSIDE the result dominates
    // a member — is the oracle's NOT EXISTS over all docs.)
  }

  test("winnowing: docs sharing a w+k-1 token run share a fingerprint") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_winnow").toString
    // Guarantee: any shared run of WinnowW + SpanW - 1 = 11 tokens
    // selects at least one identical fingerprint hash in both docs —
    // POSITION-INDEPENDENTLY (doc 2 carries the run at a different
    // offset). Doc 3 shares nothing.
    val run = (1 to 11).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      (1L, s"$run uniq1a uniq1b uniq1c uniq1d uniq1e uniq1f uniq1g uniq1h"),
      (2L, s"uniq2a uniq2b uniq2c uniq2d uniq2e $run"),
      (3L, "cold1 cold2 cold3 cold4 cold5 cold6 cold7 cold8 cold9 cold10" +
        " cold11 cold12 cold13 cold14 cold15 cold16"))
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val pairs = Registry.queries("tdp_winnow_fingerprint")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Long]("shared_fp")).toMap
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) >= 1L,
      s"shared 11-token run must select a common fingerprint: $pairs")
    assert(!pairs.keys.exists { case (a, b) => a == 3L || b == 3L },
      s"doc 3 shares no content, must pair with nobody: $pairs")
  }

  test("winnowing packing: hash recovery exact past the old 2^21 bound") {
    import spark.implicits._
    // r9 ADVICE regression: the old base-2^21 packing corrupted the
    // recovered hash (h-1) once a doc had more than 2^21 k-gram windows.
    // The widened base-2^32 packing must recover h EXACTLY at the
    // extremes: h at the polyhash modulus bound and positions far past
    // 2^21 (the platform's 2 GiB row cap keeps p0 < 2^31 < 2^32 slots).
    val rows = Seq(
      (1000000006L, 0L),            // max hash, first window
      (1000000006L, 2097152L),      // max hash, first position PAST 2^21
      (1000000006L, 2147483646L),   // max hash, max platform position
      (0L, 2147483646L),            // min hash, max position
      (1L, 5000000L))
    val got = rows.toDF("h", "p0")
      .selectExpr("h", "p0", "h * 4294967296 + (4294967295 - p0) AS key")
      .selectExpr("h", "p0", "key", "key div 4294967296 AS fh")
      .collect()
    got.foreach { r =>
      assert(r.getAs[Long]("fh") == r.getAs[Long]("h"),
        s"packing must round-trip the hash: $r")
      assert(r.getAs[Long]("key") > 0, s"packed key overflowed: $r")
    }
    // Tie-break direction: same hash, larger position -> SMALLER key,
    // so min() selects the rightmost occurrence within a window.
    val k1 = 1000000006L * 4294967296L + (4294967295L - 10L)
    val k2 = 1000000006L * 4294967296L + (4294967295L - 11L)
    assert(k2 < k1, "min must prefer the rightmost position on hash ties")
  }

  test("pii redact: planted SSN/email/id are replaced, residual is zero") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_pii").toString
    val rows = Seq(
      (1L, "call 123-45-6789 or mail bob.smith@example.com now"),
      (2L, "account 123456789012 flagged"),
      (3L, "no pii here at all"))
    rows.toDF("c_custkey", "c_name").write.parquet(s"$dir/customer.parquet")
    val got = Registry.queries("tdp_pii_redact")(spark, dir)
      .collect().map(r => r.getAs[Long]("c_custkey") -> r).toMap
    assert(got(1L).getAs[String]("redacted") ==
      "call <SSN> or mail <EMAIL> now")
    assert(got(1L).getAs[Long]("n_ssn") == 1L &&
      got(1L).getAs[Long]("n_email") == 1L)
    assert(got(2L).getAs[String]("redacted") == "account <ID> flagged" &&
      got(2L).getAs[Long]("n_id") == 1L)
    assert(got(3L).getAs[String]("redacted") == "no pii here at all")
    got.values.foreach(r => assert(r.getAs[Long]("n_residual") == 0L,
      s"redaction must leave no residual matches: $r"))
  }

  test("leakage-safe split: clusters never span splits, totals close") {
    val rows = Registry.queries("tdp_leakage_safe_split")(spark, sf).collect()
    val nDocs = Registry.table(spark, sf, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs,
      "every document lands in exactly one split")
    rows.foreach(r => assert(r.getAs[Long]("leaky_clusters") == 0L,
      s"the certificate column must be zero: $r"))
    assert(rows.map(_.getAs[String]("split")).toSet
      .subsetOf(Set("train", "val", "test")))
    // The train split must dominate (8/10 hash mass).
    val byName = rows.map(r => r.getAs[String]("split") ->
      r.getAs[Long]("n_docs")).toMap
    assert(byName("train") > byName.getOrElse("val", 0L) &&
      byName("train") > byName.getOrElse("test", 0L))
  }

  test("rank fusion: three fused rows per query, doubly-ranked hits lead") {
    val rows = Registry.queries("tdp_rank_fusion")(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    byQ.foreach { case (q, rs) =>
      assert(rs.length == 3, s"query $q: ${rs.length} fused rows")
      val sorted = rs.sortBy(_.getAs[Long]("fused_rank"))
      // Fused order must be non-increasing in rrf score.
      assert(sorted.sliding(2).forall {
        case Array(a, b) =>
          a.getAs[Long]("rrf_micro") >= b.getAs[Long]("rrf_micro")
        case _ => true
      })
      // A candidate ranked 1 by BOTH lists must be fused rank 1
      // (it holds the maximum possible score).
      sorted.find(r => r.getAs[Long]("rank_exact") == 1L &&
        r.getAs[Long]("rank_ivf") == 1L)
        .foreach(r => assert(r.getAs[Long]("fused_rank") == 1L))
    }
  }

  test("quality classifier: the gradient steps beat the base rate") {
    val rows = Registry.queries("tdp_quality_classifier")(spark, sf)
      .collect().sortBy(_.getAs[Long]("step"))
    assert(rows.length == 4)
    val acc0 = rows.head.getAs[Long]("acc_permille")
    val accLast = rows.last.getAs[Long]("acc_permille")
    // Step 0 is the untrained w=0 model (predict-all-positive); training
    // must clear BOTH the initial accuracy and the majority-class rate
    // (1000 - acc0), or the model only memorized the imbalance.
    assert(accLast > acc0, s"training never improved: $acc0 -> $accLast")
    assert(accLast > 1000 - acc0,
      s"model collapsed to the majority class: $accLast <= ${1000 - acc0}")
  }

  test("greedy segment: pieces rebuild the word from the learned vocab") {
    val rows = Registry.queries("tdp_greedy_segment")(spark, sf).collect()
    assert(rows.nonEmpty)
    // The piece vocabulary = every BPE final piece + every single char.
    val vocab = rows.flatMap(_.getAs[String]("bpe_pieces").split('|')).toSet
    rows.foreach { r =>
      val word = r.getAs[String]("word")
      val pieces = r.getAs[String]("greedy_pieces").split('|')
      // Segmentation is a partition of the word's characters in order.
      assert(pieces.mkString == word,
        s"'$word' segmented to ${pieces.mkString("|")}")
      assert(r.getAs[Long]("n_greedy") == pieces.length.toLong)
      // Every multi-char piece must come from the learned vocabulary
      // (single chars are the universal fallback). NOTE deliberately NOT
      // asserted: n_greedy <= n_bpe — greedy longest-match can strand
      // characters and come out FINER than the merge-order segmentation
      // (the classic greedy-tokenizer failure the `agree` column exists
      // to surface).
      pieces.filter(_.length > 1).foreach(p =>
        assert(vocab.contains(p), s"'$word': piece '$p' not in vocab"))
      assert(r.getAs[Boolean]("agree") ==
        (r.getAs[String]("greedy_pieces") == r.getAs[String]("bpe_pieces")))
    }
  }

  test("greedy segment: planted corpus forces greedy/BPE disagreement") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_greedy").toString
    // Pair frequencies engineered so the six learned merges are, in
    // order: bc(110) de(90) fg(80) hi(70) jk(65) ab(60) — (b,c) learned
    // BEFORE (a,b). The probe word "abc" therefore BPE-segments as
    // a|bc (the bc merge fires first and blocks ab), while greedy
    // longest-match grabs the 'ab' piece at position 1 and emits ab|c:
    // the classic inference divergence the `agree` column exists to
    // surface, and the input where the two deliberately-different
    // implementations must BOTH produce the same non-trivial answer.
    val docs = Seq(
      (1L, ("bc " * 105).trim),
      (2L, ("de " * 90).trim),
      (3L, ("fg " * 80).trim),
      (4L, ("hi " * 70).trim),
      (5L, ("jk " * 65).trim),
      (6L, ("abx " * 55).trim),
      (7L, ("abc " * 5).trim))
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = Registry.queries("tdp_greedy_segment")(spark, dir)
      .collect().map(r => r.getAs[String]("word") -> r).toMap
    val abc = got("abc")
    assert(abc.getAs[String]("bpe_pieces") == "a|bc", abc.toString)
    assert(abc.getAs[String]("greedy_pieces") == "ab|c", abc.toString)
    assert(!abc.getAs[Boolean]("agree"))
    // And the filler words agree trivially (their own merge is their
    // whole segmentation).
    assert(got("bc").getAs[Boolean]("agree"))
    assert(got("de").getAs[Boolean]("agree"))
  }

  test("bm25: top-20 is positive, full-match docs present, ranked sane") {
    val rows = Registry.queries("tdp_bm25")(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      // Lucene idf is always positive, so matched docs score positive.
      assert(r.getAs[Long]("score_micro") > 0L, r.toString)
      val m = r.getAs[Long]("n_matched")
      assert(m >= 1L && m <= 3L)
    }
    // The head of the list should be saturated with full 3-term matches
    // on this dense corpus, and scores must be non-increasing.
    val sorted = rows.sortBy(-_.getAs[Long]("score_micro"))
    assert(sorted.head.getAs[Long]("n_matched") == 3L)
    assert(sorted.sliding(2).forall {
      case Array(a, b) =>
        a.getAs[Long]("score_micro") >= b.getAs[Long]("score_micro")
      case _ => true
    })
  }

  test("classifier calibration: bins partition the corpus, monotone truth") {
    val rows = Registry.queries("tdp_classifier_calibration")(spark, sf)
      .collect().sortBy(_.getAs[Long]("bin"))
    val nDocs = Registry.table(spark, sf, "documents")
      .filter(length(col("text")) > 0).count()
    assert(rows.map(_.getAs[Long]("n")).sum == nDocs,
      "every scored doc lands in exactly one probability bin")
    rows.foreach { r =>
      val bin = r.getAs[Long]("bin")
      assert(bin >= 0 && bin <= 9)
      val obs = r.getAs[Long]("obs_pos_permille")
      assert(obs >= 0 && obs <= 1000)
      val mp = r.getAs[Long]("mean_p_micro")
      // Mean confidence must sit inside its own bin's range (the top
      // bin absorbs p = 1e6).
      assert(mp >= bin * 100000 && mp < (bin + 1) * 100000 + 1)
    }
    // A trained model's observed positive rate must not DECREASE as
    // confidence rises (weak monotonicity across populated bins).
    val obsSeq = rows.map(_.getAs[Long]("obs_pos_permille"))
    assert(obsSeq.zip(obsSeq.tail).forall { case (a, b) => b >= a },
      s"reliability not monotone: ${obsSeq.mkString(",")}")
  }

  test("dedup apply: canonical copy survives, clone loses exactly the span") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_apply").toString
    // Docs 1 and 2 share an 8-token boilerplate run; doc 1 (min id) is
    // the canonical owner. Doc 3 is untouched unique text.
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"$boiler own1 own2 own3"),
      (2L, s"pre1 pre2 $boiler post1"),
      (3L, "solo1 solo2 solo3 solo4 solo5 solo6 solo7 solo8 solo9"))
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = Registry.queries("tdp_dedup_apply")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // Owner keeps everything.
    assert(got(1L).getAs[Long]("n_removed") == 0L)
    assert(got(1L).getAs[String]("kept_text") == s"$boiler own1 own2 own3")
    // The clone loses exactly the 8 boilerplate tokens; its unique
    // prefix/suffix survive, and the removed text still exists verbatim
    // in the owner's kept text.
    assert(got(2L).getAs[Long]("n_removed") == 8L, got(2L).toString)
    assert(got(2L).getAs[String]("kept_text") == "pre1 pre2 post1")
    assert(got(1L).getAs[String]("kept_text").contains(boiler))
    // Untouched doc passes through whole.
    assert(got(3L).getAs[Long]("n_removed") == 0L)
    // Accounting closes on every row.
    got.values.foreach { r =>
      val keptToks = r.getAs[String]("kept_text")
        .split(" ").count(_.nonEmpty).toLong
      assert(keptToks + r.getAs[Long]("n_removed") == r.getAs[Long]("n_toks"))
    }
  }

  test("span corruption: splicing target back into corrupted rebuilds the doc") {
    val out = Registry.queries("tdp_span_corruption")(spark, sf)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val originals = Registry.table(spark, sf, "documents")
      .selectExpr("doc_id",
        "concat_ws(' ', filter(split(text, '\\\\s+'), x -> x != '')) AS norm")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.nonEmpty)
    val sentinel = "<X_(\\d+)>".r
    out.foreach { case (id, r) =>
      // Parse target into sentinel -> span tokens.
      val target = r.getAs[String]("target")
      val spans = scala.collection.mutable.Map.empty[String, List[String]]
      var current: String = null
      target.split(" ").filter(_.nonEmpty).foreach { t =>
        if (sentinel.matches(t)) { current = t; spans(current) = Nil }
        else spans(current) = spans(current) :+ t
      }
      val rebuilt = r.getAs[String]("corrupted").split(" ")
        .filter(_.nonEmpty)
        .flatMap(t => if (sentinel.matches(t)) spans(t) else List(t))
        .mkString(" ")
      assert(rebuilt == originals(id),
        s"doc $id: reconstruction mismatch\n got: $rebuilt\nwant: ${originals(id)}")
      // Accounting: masked mass matches the target's token payload.
      val payload = spans.values.map(_.size).sum
      assert(payload == r.getAs[Long]("n_masked"),
        s"doc $id: target carries $payload tokens, n_masked says ${r.get(3)}")
      val pm = r.getAs[Long]("mask_permille")
      assert(pm >= 0 && pm <= 600, s"doc $id: mask ratio $pm outside band")
    }
  }

  test("markov chain: planted transitions count and normalize exactly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("q42_markov").toString
    // user 1: A B A B (A->B x2, B->A x1); user 2: A C (A->C x1).
    val ev = Seq(
      (1L, 10L * 1000000000L, 1L, "A"), (2L, 20L * 1000000000L, 1L, "B"),
      (3L, 30L * 1000000000L, 1L, "A"), (4L, 40L * 1000000000L, 1L, "B"),
      (5L, 15L * 1000000000L, 2L, "A"), (6L, 25L * 1000000000L, 2L, "C"))
    ev.toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(s"$dir/events.parquet")
    val got = Registry.queries("q42_markov_chain")(spark, dir).collect()
      .map(r => (r.getAs[String]("prev_type"), r.getAs[String]("next_type"))
        -> (r.getAs[Long]("n"), r.getAs[Long]("permille"))).toMap
    assert(got == Map(
      ("A", "B") -> ((2L, 666L)), // 2 of A's 3 exits
      ("A", "C") -> ((1L, 333L)),
      ("B", "A") -> ((1L, 1000L))), got)
  }

  test("gap islands: streak lengths, span and gap count per user") {
    import spark.implicits._
    val dir = Files.createTempDirectory("q43_gaps").toString
    // user 1 active days {0,1,2, 5,6, 9}: streaks 3/2/1, span 10, 4 gaps.
    val days1 = Seq(0L, 1L, 2L, 5L, 6L, 9L)
    val ev = days1.zipWithIndex.map { case (d, ix) =>
      (ix.toLong, d * 86400L * 1000000000L + 1000000000L, 1L, "x")
    } :+ ((99L, 3L * 86400L * 1000000000L, 2L, "x"))
    ev.toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(s"$dir/events.parquet")
    val got = Registry.queries("q43_gap_islands")(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_active_days"), r.getAs[Long]("span_days"),
          r.getAs[Long]("n_gap_days"), r.getAs[Long]("n_streaks"),
          r.getAs[Long]("longest_streak"))).toMap
    assert(got(1L) == ((6L, 10L, 4L, 3L, 3L)), got)
    assert(got(2L) == ((1L, 1L, 0L, 1L, 1L)), got)
  }

  test("ewma anomaly: integer recurrence and spike flag replay by hand") {
    import spark.implicits._
    val dir = Files.createTempDirectory("q44_ewma").toString
    // user 1 daily counts day0=10, day1=1, day2=40:
    //   seed 10000; d1: (9*10000+1000)/10 = 9100, 1000 < 2*10000 ok;
    //   d2: 40000 > 2*9100 -> anomaly; (9*9100+40000)/10 = 12190.
    val ev = (0 until 10).map(i =>
      (i.toLong, 0L * 86400e9.toLong + i * 1000000000L, 1L, "x")) ++
      Seq((20L, 1L * 86400L * 1000000000L, 1L, "x")) ++
      (0 until 40).map(i =>
        (30L + i, 2L * 86400L * 1000000000L + i * 1000000000L, 1L, "x"))
    ev.toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(s"$dir/events.parquet")
    val r = Registry.queries("q44_ewma_anomaly")(spark, dir).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_days") == 3L)
    assert(r.head.getAs[Long]("ewma_final_milli") == 12190L, r.head)
    assert(r.head.getAs[Long]("n_anomaly_days") == 1L, r.head)
  }

  test("ewma anomaly: a 120000-event day survives the packing (r10 bound)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("q44_ewma_hot").toString
    // REGRESSION (round-10 ADVICE): the old base-1e5 packing silently
    // bled a >=100000 daily count into the day field, corrupting both
    // the sort order and the count extraction. Under the widened 2^36
    // packing a 120000-event day must replay exactly: seed 120000000
    // milli; day1 cnt=10 -> (9*120000000 + 10000)/10 = 108001000, no
    // spike (10000 < 2*120000000).
    val ev = (0 until 120000).map(i =>
      (i.toLong, 0L * 86400L + i % 86400L, 1L, "x")).map { case (id, s, u, t) =>
      (id, s * 1000000000L, u, t)
    } :+ ((200000L, 1L * 86400L * 1000000000L, 1L, "x")) :+
      ((200001L, 1L * 86400L * 1000000000L + 5L * 1000000000L, 1L, "x")) :+
      ((200002L, 1L * 86400L * 1000000000L + 6L * 1000000000L, 1L, "x")) :+
      ((200003L, 1L * 86400L * 1000000000L + 7L * 1000000000L, 1L, "x")) :+
      ((200004L, 1L * 86400L * 1000000000L + 8L * 1000000000L, 1L, "x")) :+
      ((200005L, 1L * 86400L * 1000000000L + 9L * 1000000000L, 1L, "x")) :+
      ((200006L, 1L * 86400L * 1000000000L + 10L * 1000000000L, 1L, "x")) :+
      ((200007L, 1L * 86400L * 1000000000L + 11L * 1000000000L, 1L, "x")) :+
      ((200008L, 1L * 86400L * 1000000000L + 12L * 1000000000L, 1L, "x")) :+
      ((200009L, 1L * 86400L * 1000000000L + 13L * 1000000000L, 1L, "x"))
    ev.toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(s"$dir/events.parquet")
    val r = Registry.queries("q44_ewma_anomaly")(spark, dir).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_days") == 2L, r.head)
    assert(r.head.getAs[Long]("ewma_final_milli") == 108001000L, r.head)
    assert(r.head.getAs[Long]("n_anomaly_days") == 0L, r.head)
  }

  test("min-label CC: a 200-hop chain converges (log-diameter pointer jump)") {
    import spark.implicits._
    // REGRESSION (round-10 ADVICE): 1-hop min propagation needs
    // diameter-many rounds, so a >64-hop core chain tripped the round
    // cap while the DuckDB recursive-CTE oracle succeeded. The pointer
    // jump makes this path graph (diameter 199) converge in ~8 rounds.
    val chain = (0L until 199L).map(i => (i, i + 1))
    val sym = (chain ++ chain.map(_.swap)).toDF("src", "dst")
    val verts = (0L to 200L).map(Tuple1(_)).toDF("vertex") // 200: isolated
    val labs = TdpQueries.minLabelCC(spark, sym, verts).collect()
      .map(r => r.getAs[Long]("vertex") -> r.getAs[Long]("lab")).toMap
    assert(labs.size == 201)
    (0L to 199L).foreach(v => assert(labs(v) == 0L, s"$v -> ${labs(v)}"))
    assert(labs(200L) == 200L, "isolated vertex keeps its own label")
  }

  test("t-closeness: 8M-row cross-product sum stays exact past the BIGINT line") {
    val dir = Files.createTempDirectory("tdp_tclose_big").toString
    // REGRESSION (round-10 ADVICE): sdiff <= (m-1)*n_g*n_tot is
    // quadratic in N, so sdiff*1e6 crossed the BIGINT ceiling near
    // N~2M rows and non-ANSI Spark wrapped silently. Two 4M-row groups
    // split over two bands give sdiff = (4e6*8e6 - 4e6*4e6) = 1.6e13
    // per group -> sdiff*1e6 = 1.6e19 > 2^63. The DECIMAL(38,0)
    // accumulator must land the exact EMD: 1.6e19 / (1*4e6*8e6) =
    // 500000 micro for both groups.
    spark.range(8000000L).selectExpr(
      "id AS c_custkey", "id % 2 AS c_nationkey", "'S' AS c_mktsegment",
      "CAST(CASE WHEN id % 2 = 0 THEN 500.0 ELSE 1500.0 END" +
        " AS DOUBLE) AS c_acctbal")
      .write.parquet(s"$dir/customer.parquet")
    val got = Registry.queries("tdp_t_closeness")(spark, dir).collect()
      .map(r => r.getAs[String]("level") ->
        (r.getAs[Long]("n_groups"), r.getAs[Long]("t_max_micro"),
          r.getAs[Long]("weak_groups"), r.getAs[Long]("exposed_rows")))
      .toMap
    assert(got("nation+segment") == ((2L, 500000L, 2L, 8000000L)), got)
    assert(got("segment") == ((1L, 0L, 0L, 0L)), got)
  }

  test("fk integrity: planted orphan, null FK and childless parent") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_fk").toString
    Seq((1L, 10L, 100L), (1L, 11L, 100L), (99L, 10L, 100L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write.parquet(s"$dir/lineitem.parquet") // 99 = orphan orderkey
    Seq((1L, Some(5L)), (2L, None: Option[Long]))
      .toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$dir/orders.parquet") // order 2: null FK, childless
    Seq(Tuple1(10L), Tuple1(11L), Tuple1(77L)).toDF("p_partkey")
      .write.parquet(s"$dir/part.parquet") // 77 childless
    Seq((100L, 0L)).toDF("s_suppkey", "s_nationkey")
      .write.parquet(s"$dir/supplier.parquet")
    Seq((5L, 0L)).toDF("c_custkey", "c_nationkey")
      .write.parquet(s"$dir/customer.parquet")
    Seq((0L, 0L)).toDF("n_nationkey", "n_regionkey")
      .write.parquet(s"$dir/nation.parquet")
    Seq(Tuple1(0L)).toDF("r_regionkey")
      .write.parquet(s"$dir/region.parquet")
    val got = Registry.queries("tdp_fk_integrity")(spark, dir).collect()
      .map(r => r.getAs[String]("relation") ->
        (r.getAs[Long]("n_child_rows"), r.getAs[Long]("n_null_fk"),
          r.getAs[Long]("n_orphan"), r.getAs[Long]("violation_permille"),
          r.getAs[Long]("n_childless_parents"))).toMap
    assert(got("lineitem.orderkey->orders") == ((3L, 0L, 1L, 333L, 1L)), got)
    assert(got("lineitem.partkey->part") == ((3L, 0L, 0L, 0L, 1L)), got)
    assert(got("orders.custkey->customer") == ((2L, 1L, 0L, 500L, 0L)), got)
    assert(got("nation.regionkey->region") == ((1L, 0L, 0L, 0L, 0L)), got)
  }

  test("t-closeness: skewed groups flagged, global-like group is not") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_tclose").toString
    // Bands come from floor(acctbal/1000). Group A spans bands 0/1/2,
    // group B is all band 2, group C all bands 0/1. Global cum
    // (2,4,8), m=3. Hand EMD: A=125000, B=375000, C=375000 micro.
    val rows = Seq(
      (1L, 0L, "S", 500.0), (2L, 0L, "S", 1500.0), (3L, 0L, "S", 2500.0),
      (4L, 1L, "S", 2500.0), (5L, 1L, "S", 2500.0), (6L, 1L, "S", 2500.0),
      (7L, 2L, "S", 500.0), (8L, 2L, "S", 1500.0))
    rows.toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
      .write.parquet(s"$dir/customer.parquet")
    val got = Registry.queries("tdp_t_closeness")(spark, dir).collect()
      .map(r => r.getAs[String]("level") ->
        (r.getAs[Long]("n_groups"), r.getAs[Long]("t_max_micro"),
          r.getAs[Long]("weak_groups"), r.getAs[Long]("exposed_rows")))
      .toMap
    assert(got("nation+segment") == ((3L, 375000L, 2L, 5L)), got)
    // The single segment group IS the global distribution: EMD 0.
    assert(got("segment") == ((1L, 0L, 0L, 0L)), got)
  }

  test("label propagation: clone families form communities, pairs too") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_lpa").toString
    val famA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val famB = "one two three four five six seven eight nine ten eleven"
    val docs = Seq(
      (1L, famA), (2L, famA), (3L, famA), // 3-clique
      (4L, famB), (5L, famB),             // 2-clique: the case
      // neighbors-only LPA oscillates on — the self-vote settles it
      (6L, "lonely words that never match anything else at all here"))
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = Registry.queries("tdp_label_propagation")(spark, dir)
      .collect().map(r => r.getAs[Long]("community") ->
        (r.getAs[Long]("community_size"), r.getAs[Long]("min_member"),
          r.getAs[Long]("max_member"))).toMap
    assert(got == Map(1L -> ((3L, 1L, 3L)), 4L -> ((2L, 4L, 5L))), got)
  }

  test("pca power: planted dominant dimension wins the component") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_pca").toString
    // All variance lives in dim 5 (alternating +-0.3), all else zero.
    val rows = (0 until 16).map { k =>
      val v = Array.fill(64)(0.0f)
      v(5) = if (k % 2 == 0) 0.3f else -0.3f
      (k.toLong, v.toSeq, k % 3)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val got = Registry.queries("tdp_pca_power")(spark, dir).collect()
      .map(r => r.getAs[Long]("dim") ->
        (r.getAs[Long]("component_micro"),
          r.getAs[Long]("diag_share_permille"),
          r.getAs[Long]("top_eig_share_permille"))).toMap
    assert(got(5L) == ((1000000L, 1000L, 1000L)), got(5L))
    assert(got(0L)._1 == 0L && got(0L)._2 == 0L, got(0L))
    assert(got.size == 64)
  }

  test("dbscan: chain yields one core + borders, blob all-core, far point noise") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_dbscan").toString
    def e0(x: Float): Seq[Float] = {
      val v = Array.fill(64)(0.0f); v(0) = x; v.toSeq
    }
    // eps = sqrt(1.4e12) micro ~ 1.183. Chain at gaps 0.5: only the
    // middle point reaches minPts=4 (core); ends and mids are borders.
    // Dense blob: every member has 4 neighbors -> all core, one
    // cluster labeled by the min member. Far point: zero neighbors.
    val rows =
      Seq(10L -> 1.0f, 11L -> 1.5f, 12L -> 2.0f, 13L -> 2.5f,
        14L -> 3.0f).map { case (id, x) => (id, e0(x), 1) } ++
      (0 until 5).map(k => (20L + k, e0(-5.0f - k * 0.01f), 2)) ++
      Seq((30L, e0(10.0f), 3))
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val got = Registry.queries("tdp_dbscan")(spark, dir).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("n_nbrs"), r.getAs[String]("role"),
          r.getAs[Long]("cluster_id"))).toMap
    assert(got(12L) == ((4L, "core", 12L)), got(12L))
    Seq(10L, 14L).foreach(id =>
      assert(got(id) == ((2L, "border", 12L)), s"$id -> ${got(id)}"))
    Seq(11L, 13L).foreach(id =>
      assert(got(id) == ((3L, "border", 12L)), s"$id -> ${got(id)}"))
    (20L to 24L).foreach(id =>
      assert(got(id) == ((4L, "core", 20L)), s"$id -> ${got(id)}"))
    assert(got(30L) == ((0L, "noise", -1L)), got(30L))
  }

  test("unigram lm: whole-word piece beats splits; floor drops rare pieces") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_unigram").toString
    // 'abab' x6: the whole-word piece (1 x ln(6/79)) out-scores every
    // split (2+ negative scores), so Viterbi keeps it whole. 'xy' x2:
    // piece 'xy' has cnt 2 < 3 -> dropped from the inventory, so the
    // word MUST segment to singles.
    Seq((1L, "abab abab abab abab abab abab cd cd cd cd cd xy xy"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = Registry.queries("tdp_unigram_lm")(spark, dir).collect()
      .sortBy(_.getAs[Long]("rank"))
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("piece"),
        r.getAs[Long]("usage"), r.getAs[Long]("share_permille"))).toSeq
    assert(got == Seq(
      (1L, "abab", 6L, 400L), (2L, "cd", 5L, 333L),
      (3L, "x", 2L, 133L), (4L, "y", 2L, 133L)), got)
  }

  test("unigram prune: dropped least-used piece forces single-char resegment") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_uniprune").toString
    // Five 2-char words, freqs 6/5/4/3/3: every whole-word piece clears
    // the cnt>=3 floor and wins its Viterbi (1 log beats 2), so ALL five
    // multi-char pieces are used -> the bottom-20% prune (floor(5/5)=1)
    // must drop a USED piece: 'gh' (usage 3, ties 'ij', piece-asc). The
    // re-segmentation sends 'gh' to singles g+h, and the shares
    // renormalize from tu=21 to tu=24.
    Seq((1L, "ab ab ab ab ab ab cd cd cd cd cd ef ef ef ef gh gh gh ij ij ij"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = Registry.queries("tdp_unigram_prune")(spark, dir).collect()
      .sortBy(_.getAs[Long]("rank"))
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("piece"),
        r.getAs[Long]("usage_pre"), r.getAs[Long]("usage_post"),
        r.getAs[Long]("share_pre_permille"),
        r.getAs[Long]("share_post_permille"))).toSeq
    assert(got == Seq(
      (1L, "ab", 6L, 6L, 285L, 250L), (2L, "cd", 5L, 5L, 238L, 208L),
      (3L, "ef", 4L, 4L, 190L, 166L), (4L, "g", 0L, 3L, 0L, 125L),
      (5L, "h", 0L, 3L, 0L, 125L), (6L, "ij", 3L, 3L, 142L, 125L)), got)
  }

  test("dbscan nprobe: np=2 row reproduces tdp_dbscan's census; sweep monotone") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_dbscan_np").toString
    def e0(x: Float): Seq[Float] = {
      val v = Array.fill(64)(0.0f); v(0) = x; v.toSeq
    }
    val rows =
      Seq(10L -> 1.0f, 11L -> 1.5f, 12L -> 2.0f, 13L -> 2.5f,
        14L -> 3.0f).map { case (id, x) => (id, e0(x), 1) } ++
      (0 until 5).map(k => (20L + k, e0(-5.0f - k * 0.01f), 2)) ++
      Seq((30L, e0(10.0f), 3))
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val census = Registry.queries("tdp_dbscan")(spark, dir).collect()
      .map(r => (r.getAs[String]("role"), r.getAs[Long]("n_nbrs")))
    val sweep = Registry.queries("tdp_dbscan_nprobe")(spark, dir).collect()
      .sortBy(_.getAs[Long]("nprobe"))
      .map(r => (r.getAs[Long]("nprobe"), r.getAs[Long]("n_candidates"),
        r.getAs[Long]("n_edges"), r.getAs[Long]("n_core"),
        r.getAs[Long]("n_border"), r.getAs[Long]("n_noise")))
    assert(sweep.map(_._1).toSeq == Seq(1L, 2L, 4L), sweep.toSeq)
    // The nprobe=2 row IS tdp_dbscan's candidate contract: the role
    // census and the half-sum-of-degrees edge count must agree exactly.
    val np2 = sweep(1)
    assert(np2._4 == census.count(_._1 == "core").toLong, (np2, census.toSeq))
    assert(np2._5 == census.count(_._1 == "border").toLong, np2)
    assert(np2._6 == census.count(_._1 == "noise").toLong, np2)
    assert(2L * np2._3 == census.map(_._2).sum, (np2, census.toSeq))
    // Widening the probe scope only ADDS candidates/edges/cores and can
    // only shrink noise — the monotone operating curve the sweep sells.
    assert(sweep.map(_._2).toSeq == sweep.map(_._2).sorted.toSeq, sweep.toSeq)
    assert(sweep.map(_._3).toSeq == sweep.map(_._3).sorted.toSeq, sweep.toSeq)
    assert(sweep.map(_._4).toSeq == sweep.map(_._4).sorted.toSeq, sweep.toSeq)
    assert(sweep.map(_._6).toSeq ==
      sweep.map(_._6).sorted.reverse.toSeq, sweep.toSeq)
  }

  test("mmr: equal-relevance near-copy loses to the diverse candidate") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_mmr").toString
    def vec(pairs: (Int, Float)*): Seq[Float] = {
      val v = Array.fill(64)(0.0f)
      pairs.foreach { case (i, x) => v(i) = x }
      v.toSeq
    }
    // Query = label-0 centroid = 0.3*e0. Candidates A1/A2 along
    // e0+e1, B along e0-e1: all have EQUAL relevance to the query,
    // but after picking A1 the redundant A2 scores 6r-4(2r) < 0 while
    // the diverse B scores ~6r. Noise vectors fill the remaining picks.
    val rows = Seq(
      (1L, vec(0 -> 0.3f, 1 -> 0.3f), 1),   // A1
      (2L, vec(0 -> 0.3f, 1 -> 0.3f), 1),   // A2 (near copy)
      (3L, vec(0 -> 0.3f, 1 -> -0.3f), 2),  // B (diverse)
      (100L, vec(0 -> 0.3f), 0),            // defines the query
      (50L, vec(2 -> 0.01f), 3), (51L, vec(3 -> 0.01f), 3))
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val got = Registry.queries("tdp_mmr_select")(spark, dir).collect()
      .sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("vec_id")).toSeq
    // 1 first (min id among equal scores), then the DIVERSE 3 over the
    // near-copy 2; 2 is never picked at all.
    assert(got == Seq(1L, 3L, 100L, 50L, 51L), got)
  }

  test("auc: perfectly separating feature scores exactly 10^6") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_auc").toString
    // No spaces, no 'the': quality = 0.6*alpha_ratio + 0.3, so the
    // alpha-permille feature x1 ranks EXACTLY as the label does.
    // all-alpha -> q=0.9 (pos); half/quarter alpha -> 0.6/0.45 (neg).
    val docs = Seq(
      (1L, "abcdefgh", "en", "s0", 8L),
      (2L, "abcd1234", "en", "s0", 8L),
      (3L, "ab123456", "en", "s0", 8L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = Registry.queries("tdp_auc_roc")(spark, dir).collect().head
    assert(r.getAs[Long]("n_pos") == 1L && r.getAs[Long]("n_neg") == 2L, r)
    assert(r.getAs[Long]("n_scores") == 3L, r)
    assert(r.getAs[Long]("auc_micro") == 1000000L, r)
    assert(r.getAs[Long]("gini_micro") == 1000000L, r)
  }

  test("ks test: disjoint source distributions hit D = 10^6") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_ks").toString
    // Source A all high-quality bands, source B all low: the banded
    // cdfs are disjoint, so for each source-vs-rest D = 1 exactly.
    val docs = Seq(
      (1L, "abcdefgh", "en", "A", 8L), (2L, "abcdefgh", "en", "A", 8L),
      (3L, "ab123456", "en", "B", 8L), (4L, "ab123456", "en", "B", 8L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Registry.queries("tdp_ks_test")(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("ks_micro"),
          r.getAs[Long]("crit_band"))).toMap
    assert(got("A")._1 == 2L && got("B")._1 == 2L, got)
    assert(got("A")._2 == 1000000L && got("B")._2 == 1000000L, got)
    // Both directions attain the max gap first at the LOW band.
    assert(got("A")._3 == got("B")._3, got)
  }

  test("chi-square: perfect lang/band dependence gives V^2 = 1") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_chi").toString
    // en docs all land in the high percent band, de docs all low ->
    // chi2 = N*min(r-1, c-1) = 4, V^2 = 1, both exact in micro units.
    val docs = Seq(
      (1L, "abcdefgh", "en", "s0", 8L), (2L, "abcdefgh", "en", "s0", 8L),
      (3L, "ab123456", "de", "s0", 8L), (4L, "ab123456", "de", "s0", 8L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = Registry.queries("tdp_chi_square")(spark, dir).collect().head
    assert(r.getAs[Long]("n_docs") == 4L && r.getAs[Long]("dof") == 1L, r)
    assert(r.getAs[Long]("chi2_micro") == 4000000L, r)
    assert(r.getAs[Long]("cramer_v2_micro") == 1000000L, r)
  }

  test("interval merge: overlap chains, touching merges, gaps split") {
    import spark.implicits._
    val dir = Files.createTempDirectory("q45_ivm").toString
    // user 1: [0,300)+[100,400) merge -> covered 400; [500,800) apart.
    // user 2: [0,300)+[300,600) TOUCH -> one span of 600.
    // user 3: 0/299/598 chain through bridging intervals -> one 898.
    val ev = Seq(
      (1L, 0L, 1L), (2L, 100L, 1L), (3L, 500L, 1L),
      (4L, 0L, 2L), (5L, 300L, 2L),
      (6L, 0L, 3L), (7L, 299L, 3L), (8L, 598L, 3L))
    ev.map { case (id, sec, u) => (id, sec * 1000000000L, u, "x") }
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(s"$dir/events.parquet")
    val got = Registry.queries("q45_interval_merge")(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_intervals"), r.getAs[Long]("covered_sec"),
          r.getAs[Long]("longest_sec"), r.getAs[Long]("n_events"))).toMap
    assert(got(1L) == ((2L, 700L, 400L, 3L)), got)
    assert(got(2L) == ((1L, 600L, 600L, 2L)), got)
    assert(got(3L) == ((1L, 898L, 898L, 3L)), got)
  }

  test("trend test: rising, falling and flat series score tau = +-10^6/0") {
    import spark.implicits._
    val dir = Files.createTempDirectory("q46_mk").toString
    def day(d: Long, i: Long): Long = (d * 86400L + i) * 1000000000L
    // up: 1/2/3 events on days 0/1/2 -> S=3, tau=1e6; down mirrored;
    // flat2: equal counts on two days -> S=0.
    val ev =
      Seq((1L, day(0, 0), 1L, "up")) ++
      (0L until 2L).map(i => (10L + i, day(1, i), 1L, "up")) ++
      (0L until 3L).map(i => (20L + i, day(2, i), 1L, "up")) ++
      (0L until 3L).map(i => (30L + i, day(0, i), 1L, "down")) ++
      (0L until 2L).map(i => (40L + i, day(1, i), 1L, "down")) ++
      Seq((50L, day(2, 0), 1L, "down")) ++
      Seq((60L, day(0, 0), 1L, "flat2"), (61L, day(1, 0), 1L, "flat2"))
    ev.toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(s"$dir/events.parquet")
    val got = Registry.queries("q46_trend_test")(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("s_stat"),
          r.getAs[Long]("n_pairs"), r.getAs[Long]("tau_micro"),
          r.getAs[String]("trend"))).toMap
    assert(got("up") == ((3L, 3L, 3L, 1000000L, "rising")), got)
    assert(got("down") == ((3L, -3L, 3L, -1000000L, "falling")), got)
    assert(got("flat2") == ((2L, 0L, 1L, 0L, "flat")), got)
  }

  test("hits: two max-normalized rounds replay by hand") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_hits").toString
    // u1 -> A x2; u2 -> A, B. Round 1: a(A)=1e6, a(B)=333333;
    // h(u1)=1e6, h(u2)=666666. Round 2: ar(A)=2666666, ar(B)=666666
    // -> a(A)=1e6, a(B)=666666*1e6 // 2666666 = 249999.
    val ev = Seq(
      (1L, 1L, 1L, "A"), (2L, 2L, 1L, "A"),
      (3L, 3L, 2L, "A"), (4L, 4L, 2L, "B"))
    ev.map { case (id, sec, u, t) => (id, sec * 1000000000L, u, t) }
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(s"$dir/events.parquet")
    val got = Registry.queries("tdp_hits")(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("w_total"),
          r.getAs[Long]("auth_micro"))).toMap
    assert(got("A") == ((2L, 3L, 1000000L)), got)
    assert(got("B") == ((1L, 1L, 249999L)), got)
  }

  test("skipgram cooc: ramp weights over the +-3 window replay by hand") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_sg").toString
    // 'a b a b': forward pairs (a,b)@d1 x2 + (a,b)@d3, (a,a)@d2,
    // (b,a)@d1, (b,b)@d2 -> weights 7/2/3/2.
    Seq((1L, "a b a b")).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val got = Registry.queries("tdp_skipgram_cooc")(spark, dir).collect()
      .map(r => (r.getAs[String]("word_a"), r.getAs[String]("word_b")) ->
        (r.getAs[Long]("weight"), r.getAs[Long]("n_pairs"))).toMap
    assert(got == Map(
      ("a", "b") -> ((7L, 3L)), ("a", "a") -> ((2L, 1L)),
      ("b", "a") -> ((3L, 1L)), ("b", "b") -> ((2L, 1L))), got)
  }

  test("k-center: farthest-first walk on a line, ties to smallest id") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_kc").toString
    def e0(x: Float): Seq[Float] = {
      val v = Array.fill(64)(0.0f); v(0) = x; v.toSeq
    }
    // Line at 0, 0.1, 1, -1, 0.5: seed id0; then the 1e12-tie between
    // id2 (+1) and id3 (-1) goes to id2; id3; id4 (0.5, d2=2.5e11);
    // id1 last (d2=1e10). All points selected -> cover radius 0.
    val rows = Seq((0L, e0(0.0f), 0), (1L, e0(0.1f), 0),
      (2L, e0(1.0f), 0), (3L, e0(-1.0f), 0), (4L, e0(0.5f), 0))
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val got = Registry.queries("tdp_kcenter")(spark, dir).collect()
      .sortBy(_.getAs[Long]("rank"))
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("d2_sel_micro2"), r.getAs[Long]("cover_r2_micro2")))
      .toSeq
    assert(got == Seq(
      (1L, 0L, 0L, 0L), (2L, 2L, 1000000000000L, 0L),
      (3L, 3L, 1000000000000L, 0L), (4L, 4L, 250000000000L, 0L),
      (5L, 1L, 10000000000L, 0L)), got)
  }

  test("theil-sen: lower median of pairwise slopes, outlier-immune") {
    import spark.implicits._
    val dir = Files.createTempDirectory("q47_ts").toString
    def day(d: Long, i: Long): Long = (d * 86400L + i) * 1000000000L
    def burst(base: Long, d: Long, n: Long, t: String) =
      (0L until n).map(i => (base + i, day(d, i), 1L, t))
    // up: counts 1/2/3 on days 0/1/2 -> all slopes 1e6, median 1e6.
    // curve: counts 1/5/2 on days 0/1/3 -> slopes 4e6, 333333 (1*1e6
    //   div 3 truncated), -1500000 -> lower median 333333.
    // one: single day -> 0 pairs, slope 0.
    val ev = burst(100, 0, 1, "up") ++ burst(110, 1, 2, "up") ++
      burst(120, 2, 3, "up") ++
      burst(200, 0, 1, "curve") ++ burst(210, 1, 5, "curve") ++
      burst(220, 3, 2, "curve") ++
      burst(300, 0, 1, "one")
    ev.toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(s"$dir/events.parquet")
    val got = Registry.queries("q47_theil_sen")(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("n_pairs"),
          r.getAs[Long]("slope_micro"))).toMap
    assert(got("up") == ((3L, 3L, 1000000L)), got)
    assert(got("curve") == ((3L, 3L, 333333L)), got)
    assert(got("one") == ((1L, 0L, 0L)), got)
  }

  test("changepoint: argmax of |N*S_k - k*T| with deterministic ties") {
    import spark.implicits._
    val dir = Files.createTempDirectory("q48_cp").toString
    def day(d: Long, i: Long): Long = (d * 86400L + i) * 1000000000L
    def burst(base: Long, d: Long, n: Long, t: String) =
      (0L until n).map(i => (base + i, day(d, i), 1L, t))
    // s: counts 1/1/5/5 on days 0..3 -> stats 8/16/8, split after day 1,
    //   left mean 1e6, right mean 5e6.
    // t: 2/2 on days 0/1 -> single interior split, stat 0.
    // x: one day -> no interior split, type dropped.
    val ev = burst(100, 0, 1, "s") ++ burst(110, 1, 1, "s") ++
      burst(120, 2, 5, "s") ++ burst(130, 3, 5, "s") ++
      burst(200, 0, 2, "t") ++ burst(210, 1, 2, "t") ++
      burst(300, 0, 3, "x")
    ev.toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(s"$dir/events.parquet")
    val got = Registry.queries("q48_changepoint")(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("total"),
          r.getAs[Long]("split_day"), r.getAs[Long]("cusum_stat"),
          r.getAs[Long]("left_mean_micro"),
          r.getAs[Long]("right_mean_micro"))).toMap
    assert(got("s") == ((4L, 12L, 1L, 16L, 1000000L, 5000000L)), got)
    assert(got("t") == ((2L, 4L, 0L, 0L, 2000000L, 2000000L)), got)
    assert(!got.contains("x"), got)
  }

  test("kcore: pendant pair peels in round 1, triangle survives") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_kcore").toString
    // Three clones of A -> LSH triangle (2-core); two clones of B ->
    // one pendant edge (peeled: both endpoints have degree 1); C is
    // isolated (never enters the pair graph).
    val a = "alpha beta gamma delta epsilon"
    val b = "zeta eta theta iota kappa"
    val c = "unique solitary text with no duplicate partner here"
    val docs = Seq(
      (1L, a), (2L, a), (3L, a), (4L, b), (5L, b), (6L, c))
    docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Registry.queries("tdp_kcore")(spark, dir).collect()
      .map(r => r.getAs[Long]("rnd") ->
        (r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges"))).toMap
    assert(got(0L) == ((5L, 4L)), got)
    assert((1L to 6L).forall(r => got(r) == ((3L, 3L))), got)
  }

  test("textrank: two damped power rounds replay by hand") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_tr").toString
    // 'a b a': symmetric weights w(a,b)=6, w(a,a)=4; strengths a=10,
    // b=6. Round 1: sc(a)=150000+85%*(1e6+400000)=1340000, sc(b)=
    // 150000+85%*600000=660000. Round 2: sc(a)=150000+85%*(660000+
    // 536000)=1166600, sc(b)=150000+85%*804000=833400.
    Seq((1L, "a b a")).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val got = Registry.queries("tdp_textrank")(spark, dir).collect()
      .map(r => r.getAs[String]("tok") ->
        (r.getAs[Long]("strength"), r.getAs[Long]("score_micro"))).toMap
    assert(got == Map(
      "a" -> ((10L, 1166600L)), "b" -> ((6L, 833400L))), got)
  }

  test("quantile norm: ranks map through the global inverse CDF") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_qn").toString
    // 'abcd' -> permille 899 (0.6+0.3 in doubles floors under 900);
    // 'ab..' -> 600 (0.3+0.3 rounds back to exactly 0.6 in IEEE
    // doubles, in BOTH engines). Global hist: 600 x3, 899 x2 ->
    // cum (3,600),(5,899).
    // Sources A/B (2 docs): r=1 -> p=1 -> 600; r=2 -> p=5 -> 899.
    // Singleton C: p=(5+1) div 2=3 -> 600.
    val docs = Seq(
      (1L, "abcd", "A"), (2L, "ab..", "A"),
      (3L, "abcd", "B"), (4L, "ab..", "B"),
      (5L, "ab..", "C"))
    docs.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Registry.queries("tdp_quantile_norm")(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("min_norm"),
          r.getAs[Long]("max_norm"), r.getAs[Long]("sum_norm"),
          r.getAs[Long]("rank_checksum"))).toMap
    assert(got("A") == ((2L, 600L, 899L, 1499L, 2398L)), got)
    assert(got("B") == ((2L, 600L, 899L, 1499L, 2398L)), got)
    assert(got("C") == ((1L, 600L, 600L, 600L, 600L)), got)
  }

  test("covisit lift: session type-set pairs replay by hand") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_cv").toString
    def ts(sec: Long): Long = sec * 1000000000L
    // Sessions: u1 {A,B}; u2 {A} then (gap > 1800) {A,B}; u3 {B,C}.
    // N=4, n_A=3, n_B=3, n_C=1; (A,B) in 2, (B,C) in 1.
    val ev = Seq(
      (1L, ts(0), 1L, "A"), (2L, ts(10), 1L, "B"),
      (3L, ts(0), 2L, "A"),
      (4L, ts(10000), 2L, "A"), (5L, ts(10010), 2L, "B"),
      (6L, ts(0), 3L, "B"), (7L, ts(5), 3L, "C"))
    ev.toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(s"$dir/events.parquet")
    val got = Registry.queries("tdp_covisit_lift")(spark, dir).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) ->
        (r.getAs[Long]("n_ab"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("lift_micro"), r.getAs[Long]("conf_a_b"),
          r.getAs[Long]("conf_b_a"))).toMap
    assert(got(("A", "B")) ==
      ((2L, 3L, 3L, 888888L, 666666L, 666666L)), got)
    assert(got(("B", "C")) ==
      ((1L, 3L, 1L, 1333333L, 333333L, 1000000L)), got)
    assert(got.size == 2, got)
  }

  test("set cover: greedy walk picks by marginal gain, stops when dry") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_sc").toString
    // Shingles: d1 {abc,bcd}, d2 {abc}, d3 {xyz,yzw,zwv}; universe 5.
    // Round 1: d3 (gain 3); round 2: d1 (gain 2, coverage complete);
    // d2 contributes nothing -> walk ends at 2 rows.
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c"), (3L, "x y z w v"))
    docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Registry.queries("tdp_set_cover")(spark, dir).collect()
      .sortBy(_.getAs[Long]("rnd"))
      .map(r => (r.getAs[Long]("rnd"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("gain"), r.getAs[Long]("covered_cum"),
        r.getAs[Long]("universe"))).toSeq
    assert(got == Seq(
      (1L, 3L, 3L, 3L, 5L), (2L, 1L, 2L, 5L, 5L)), got)
  }

  test("burstiness: stitched day-bucket gaps equal the global lag") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_bu").toString
    def ts(sec: Long): Long = sec * 1000000000L
    // Type A: secs 0,10,30 (day 0) and 86500 (day 1) -> in-day gaps
    // 10,20 plus the boundary gap 86470. n=3, sum=86500,
    // ssq=100+400+86470^2=7477061400. Type B has one event: no gaps,
    // absent from the output in both engines.
    val ev = Seq(
      (1L, ts(0), 1L, "A"), (2L, ts(10), 1L, "B"),
      (3L, ts(10), 2L, "A"), (4L, ts(30), 3L, "A"),
      (5L, ts(86500), 4L, "A"))
    ev.toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(s"$dir/events.parquet")
    val got = Registry.queries("tdp_burstiness")(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_gaps"), r.getAs[Long]("sum_gap"),
          r.getAs[Long]("mean_gap_micro"), r.getAs[Long]("fano_micro"),
          r.getAs[Long]("cv2_micro"))).toMap
    assert(got("A") ==
      ((3L, 86500L, 28833333333L, 57606682851L, 1997919L)), got)
    assert(!got.contains("B"), got)
    assert(got.size == 1, got)
  }

  test("mutual info: PMI cells and the sign-split total replay by hand") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_mi").toString
    // Cells: (en,s1)x2, (en,s2)x1, (fr,s1)x1. N=4, c_en=3, c_fr=1,
    // c_s1=3, c_s2=1. pmi(en,s1)=floor(ln(8/9)e6)=-117784;
    // pmi(en,s2)=pmi(fr,s1)=floor(ln(4/3)e6)=287682.
    // tot = 2*(-117784)+287682+287682 = 339796 -> mi_total = 84949.
    val docs = Seq(
      (1L, "aa", "en", "s1"), (2L, "bb", "en", "s1"),
      (3L, "cc", "en", "s2"), (4L, "dd", "fr", "s1"))
    docs.map { case (id, t, l, src) => (id, t, l, src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Registry.queries("tdp_mutual_info")(spark, dir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source")) ->
        (r.getAs[Long]("c_xy"), r.getAs[Long]("c_x"), r.getAs[Long]("c_y"),
          r.getAs[Long]("pmi_micro"), r.getAs[Long]("mi_total_micro")))
      .toMap
    assert(got(("en", "s1")) == ((2L, 3L, 3L, -117784L, 84949L)), got)
    assert(got(("en", "s2")) == ((1L, 3L, 1L, 287682L, 84949L)), got)
    assert(got(("fr", "s1")) == ((1L, 1L, 3L, 287682L, 84949L)), got)
    assert(got.size == 3, got)
  }

  test("edit dedup: Levenshtein verify over planted clone pair") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_ed").toString
    // Docs 1,2 are exact clones (every band agrees -> LSH pair), doc 3
    // shares no shingles. lev(clone)=0 -> sim 10^6, is_dup.
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z w v"))
    docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Registry.queries("tdp_edit_dedup")(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        (r.getAs[Long]("lev"), r.getAs[Long]("max_len"),
          r.getAs[Long]("sim_micro"), r.getAs[Boolean]("is_dup"))).toMap
    assert(got((1L, 2L)) == ((0L, 9L, 1000000L, true)), got)
    assert(got.size == 1, got)
  }

  test("bfs reach: hop census from the max-degree seed") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_bf").toString
    // Docs 1,2,3 identical -> a 3-clique in the LSH graph; doc 4
    // isolated. Every vertex has degree 2; seed = min id = 1.
    // hop 0: {1}; hop 1: {2,3}; hop 2 empty -> two rows.
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d e"), (3L, "a b c d e"),
      (4L, "x y z w v"))
    docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Registry.queries("tdp_bfs_reach")(spark, dir).collect()
      .sortBy(_.getAs[Long]("hop"))
      .map(r => (r.getAs[Long]("hop"), r.getAs[Long]("frontier_n"),
        r.getAs[Long]("cum_reached"))).toSeq
    assert(got == Seq((0L, 1L, 1L), (1L, 2L, 3L)), got)
  }

  test("threshold sweep: census per Jaccard cutoff replays by hand") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_tw").toString
    // Shingles: d1=d2={abc,bcd,cde}; d3={abc,bcx,cxy} -> J(1,3)=
    // J(2,3)=1/5=0.2; d4 isolated. t=0.2: pairs {12,13,23}, one
    // 3-doc component. t=0.5 and 0.8: only the clone pair.
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d e"), (3L, "a b c x y"),
      (4L, "p q r s t"))
    docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Registry.queries("tdp_threshold_sweep")(spark, dir).collect()
      .map(r => r.getAs[Long]("thresh_micro") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_multi_clusters"),
          r.getAs[Long]("docs_in_multi"), r.getAs[Long]("max_cluster"),
          r.getAs[Long]("dup_rate_micro"))).toMap
    assert(got(200000L) == ((3L, 1L, 3L, 3L, 500000L)), got)
    assert(got(500000L) == ((1L, 1L, 2L, 2L, 250000L)), got)
    assert(got(800000L) == ((1L, 1L, 2L, 2L, 250000L)), got)
  }

  test("markov stationary: power rounds settle on the chain fixpoint") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_ms").toString
    def ts(sec: Long): Long = sec * 1000000000L
    // u1: A,B,A,B; u2: B,B. Transitions: A->B x2 (rowtot A=2),
    // B->A x1, B->B x1 (rowtot B=2). Marginals A=2,B=4 of 6 ->
    // x0=(333333, 666666), which is already the integer fixpoint:
    // x(A)=666666*1 div 2=333333; x(B)=333333*2 div 2+666666 div 2
    // =666666.
    val ev = Seq(
      (1L, ts(0), 1L, "A"), (2L, ts(10), 1L, "B"),
      (3L, ts(20), 1L, "A"), (4L, ts(30), 1L, "B"),
      (5L, ts(0), 2L, "B"), (6L, ts(10), 2L, "B"))
    ev.toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(s"$dir/events.parquet")
    val got = Registry.queries("tdp_markov_stationary")(spark, dir)
      .collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("stationary_micro"))).toSeq
    assert(got == Seq(("B", 666666L), ("A", 333333L)), got)
  }

  test("vocab growth: decile census replays by hand") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_vg").toString
    // Docs (by id order): 'a b', 'b c', '', 'a', 'd d'. N=5; prefixes
    // at deciles 1..10 hold 0,1,1,2,2,3,3,4,4,5 docs; cumulative
    // tokens 0,2,2,4,4,4,4,5,5,7; vocab 0,2,2,3,3,3,3,3,3,4.
    val docs = Seq(
      (1L, "a b"), (2L, "b c"), (3L, ""), (4L, "a"), (5L, "d d"))
    docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Registry.queries("tdp_vocab_growth")(spark, dir).collect()
      .sortBy(_.getAs[Long]("decile"))
      .map(r => (r.getAs[Long]("decile"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("cum_tokens"), r.getAs[Long]("cum_vocab"),
        r.getAs[Long]("new_vocab"))).toSeq
    assert(got == Seq(
      (1L, 0L, 0L, 0L, 0L), (2L, 1L, 2L, 2L, 2L), (3L, 1L, 2L, 2L, 0L),
      (4L, 2L, 4L, 3L, 1L), (5L, 2L, 4L, 3L, 0L), (6L, 3L, 4L, 3L, 0L),
      (7L, 3L, 4L, 3L, 0L), (8L, 4L, 5L, 3L, 0L), (9L, 4L, 5L, 3L, 0L),
      (10L, 5L, 7L, 4L, 1L)), got)
  }

  test("session entropy: micro-nat bands replay by hand") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_se").toString
    def ts(sec: Long): Long = sec * 1000000000L
    // u1: A,A,B,B -> H = 2*floor(0.5*ln(2)*1e6) = 693146 (band 2);
    // u2: A -> H = 0 (band 0);
    // u3: A,B,C,C -> 2*floor(0.25*ln(4)*1e6) + floor(0.5*ln(2)*1e6)
    //   = 2*346573 + 346573 = 1039719 (band 4).
    val ev = Seq(
      (1L, ts(0), 1L, "A"), (2L, ts(1), 1L, "A"),
      (3L, ts(2), 1L, "B"), (4L, ts(3), 1L, "B"),
      (5L, ts(0), 2L, "A"),
      (6L, ts(0), 3L, "A"), (7L, ts(1), 3L, "B"),
      (8L, ts(2), 3L, "C"), (9L, ts(3), 3L, "C"))
    ev.toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(s"$dir/events.parquet")
    val got = Registry.queries("tdp_session_entropy")(spark, dir).collect()
      .map(r => r.getAs[Long]("band") ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("min_h"),
          r.getAs[Long]("max_h"))).toMap
    assert(got(0L) == ((1L, 0L, 0L)), got)
    assert(got(2L) == ((1L, 693146L, 693146L)), got)
    assert(got(4L) == ((1L, 1039719L, 1039719L)), got)
    assert(got.size == 3, got)
  }

  test("curriculum interleave: weighted round-robin vtime replays") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_cu").toString
    // A has 12 of 15 tokens (w=894427), B 3 (w=447213); equal quality
    // everywhere so within-source rank = doc_id order. vtimes:
    // A: 1118, 2236, 3354, 4472; B: 2236 — the A2/B1 tie breaks on
    // source name.
    val docs = Seq(
      (1L, "z z z", "A"), (2L, "y y y", "A"), (3L, "x x x", "A"),
      (4L, "w w w", "A"), (5L, "v v v", "B"))
    docs.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Registry.queries("tdp_curriculum_interleave")(spark, dir)
      .collect().sortBy(_.getAs[Long]("pos"))
      .map(r => (r.getAs[Long]("pos"), r.getAs[String]("source"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("rnk"),
        r.getAs[Long]("vtime"))).toSeq
    assert(got == Seq(
      (1L, "A", 1L, 1L, 1118L), (2L, "A", 2L, 2L, 2236L),
      (3L, "B", 5L, 1L, 2236L), (4L, "A", 3L, 3L, 3354L),
      (5L, "A", 4L, 4L, 4472L)), got)
  }

  test("epoch plan: budget split, repeat cap and starvation replay") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_ep").toString
    // Same corpus: tot=15, budget=7, z=1341640. desired A=4, B=2;
    // repeats A=333333, B=666666 micro-epochs; nothing starved.
    val docs = Seq(
      (1L, "z z z", "A"), (2L, "y y y", "A"), (3L, "x x x", "A"),
      (4L, "w w w", "A"), (5L, "v v v", "B"))
    docs.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Registry.queries("tdp_epoch_plan")(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("w_micro"),
          r.getAs[Long]("desired_tokens"), r.getAs[Long]("repeats_micro"),
          r.getAs[Long]("granted_repeats_micro"),
          r.getAs[Long]("granted_tokens"),
          r.getAs[Boolean]("starved"))).toMap
    assert(got("A") ==
      ((12L, 894427L, 4L, 333333L, 333333L, 4L, false)), got)
    assert(got("B") ==
      ((3L, 447213L, 2L, 666666L, 666666L, 2L, false)), got)
  }

  test("assortativity: path graph is exactly -1 in rational micro") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_as").toString
    // J(1,2)=J(1,3)=0.2 (one shared shingle of 5), J(2,3)=0 -> the
    // path 2-1-3. Degrees 2,1,1; m=4, sum_x=6, sum_x2=10, sum_xy=8;
    // r = (32-36)/(40-36) = -1.
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c p q"), (3L, "c d e r s"),
      (4L, "x y z w v"))
    docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Registry.queries("tdp_assortativity")(spark, dir).collect()
    assert(got.length == 1, got.toSeq)
    val r = got(0)
    assert((r.getAs[Long]("m"), r.getAs[Long]("sum_x"),
      r.getAs[Long]("sum_x2"), r.getAs[Long]("sum_xy"),
      r.getAs[Long]("assort_micro")) ==
      ((4L, 6L, 10L, 8L, -1000000L)), r)
  }

  test("audience overlap: user-level type Jaccard replays by hand") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_ao").toString
    def ts(sec: Long): Long = sec * 1000000000L
    // Audiences: A={u1,u2,u3}, B={u1,u4}, C={u3,u4}. Duplicate events
    // within a user collapse via the distinct frame.
    val ev = Seq(
      (1L, ts(0), 1L, "A"), (2L, ts(1), 1L, "B"), (3L, ts(2), 1L, "A"),
      (4L, ts(0), 2L, "A"),
      (5L, ts(0), 3L, "A"), (6L, ts(1), 3L, "C"),
      (7L, ts(0), 4L, "B"), (8L, ts(1), 4L, "C"))
    ev.toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(s"$dir/events.parquet")
    val got = Registry.queries("tdp_audience_overlap")(spark, dir)
      .collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) ->
        (r.getAs[Long]("n_ab"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("jaccard_micro"), r.getAs[Long]("overlap_micro")))
      .toMap
    assert(got(("A", "B")) == ((1L, 3L, 2L, 250000L, 500000L)), got)
    assert(got(("A", "C")) == ((1L, 3L, 2L, 250000L, 500000L)), got)
    assert(got(("B", "C")) == ((1L, 2L, 2L, 333333L, 500000L)), got)
    assert(got.size == 3, got)
  }

  test("transitivity: wedge moments and oriented triangles replay") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_tr").toString
    // Exact-Jaccard edges: 12 (0.5), 13 (0.5), 23 (0.2), 14 (0.2),
    // 34 (0.2) -> degrees 3,2,3,2; wedges sum C(deg,2) = 3+1+3+1 = 8;
    // triangles {1,2,3} and {1,3,4} -> transitivity 6/8, open 2.
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d q"), (3L, "b c d e f"),
      (4L, "c d e r s"))
    docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Registry.queries("tdp_transitivity")(spark, dir).collect()
    assert(got.length == 1, got.toSeq)
    val r = got(0)
    assert((r.getAs[Long]("n_edges"), r.getAs[Long]("n_wedges"),
      r.getAs[Long]("n_triangles"), r.getAs[Long]("transitivity_micro"),
      r.getAs[Long]("open_wedges")) == ((5L, 8L, 2L, 750000L, 2L)), r)
  }

  test("emb outliers: bands partition the corpus and shares sum") {
    // Consistency on the real sf0.001 embeddings: every vector lands in
    // exactly one band, shares approach 10^6 (truncating divide loses
    // < 1 micro per band), and band bounds hold min/max sims.
    val dir = "/root/testdata/sf0.001"
    val rows = Registry.queries("tdp_emb_outliers")(spark, dir).collect()
    val total = rows.map(_.getAs[Long]("n_vecs")).sum
    val nEmb = Registry.table(spark, dir, "embeddings").count()
    assert(total == nEmb, (total, nEmb))
    val shares = rows.map(_.getAs[Long]("share_micro")).sum
    assert(shares <= 1000000L && shares > 1000000L - rows.length,
      (shares, rows.length))
    rows.foreach { r =>
      val b = r.getAs[Long]("band")
      assert(math.floor(r.getAs[Double]("min_sim") * 1000).toLong == b, r)
      assert(math.floor(r.getAs[Double]("max_sim") * 1000).toLong == b, r)
    }
  }

  test("conversion latency: strict-after funnel with banded lag") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_cl").toString
    def ts(sec: Long): Long = sec * 1000000000L
    // X and Y tie at 4 events -> X wins the name tiebreak. u1 converts
    // in 100 s (lt_1h), u2 in 5000 s (lt_1d), u3 exposed-only, u4 did
    // Y BEFORE X (not converted), u5 never did X (not exposed).
    val ev = Seq(
      (1L, ts(0), 1L, "X"), (2L, ts(100), 1L, "Y"),
      (3L, ts(0), 2L, "X"), (4L, ts(5000), 2L, "Y"),
      (5L, ts(0), 3L, "X"),
      (6L, ts(0), 4L, "Y"), (7L, ts(10), 4L, "X"),
      (8L, ts(0), 5L, "Y"))
    ev.toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(s"$dir/events.parquet")
    val got = Registry.queries("tdp_conversion_latency")(spark, dir)
      .collect()
      .map(r => r.getAs[String]("band") ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("n_exposed"),
          r.getAs[Long]("n_converted"), r.getAs[Long]("conv_micro")))
      .toMap
    assert(got("lt_1h") == ((1L, 4L, 2L, 500000L)), got)
    assert(got("lt_1d") == ((1L, 4L, 2L, 500000L)), got)
    assert(got.size == 2, got)
  }

  test("quality by decile: micro-floored moments replay, gaps stay null") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_qd").toString
    // 5 docs -> deciles 1,3,5,7,9. 'abcd' floors to 899999, 'ab..' to
    // 600000; the empty doc (decile 5) is unscored: null moments.
    val docs = Seq(
      (1L, "abcd"), (2L, "ab.."), (3L, ""), (4L, "abcd"), (5L, "ab.."))
    docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Registry.queries("tdp_quality_by_decile")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("decile") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_scored"),
          Option(r.getAs[java.lang.Long]("sum_q_micro")),
          Option(r.getAs[java.lang.Long]("mean_q_micro")))).toMap
    assert(got(1L) == ((1L, 1L, Some(899999L), Some(899999L))), got)
    assert(got(3L) == ((1L, 1L, Some(600000L), Some(600000L))), got)
    assert(got(5L) == ((1L, 0L, None, None)), got)
    assert(got(7L) == ((1L, 1L, Some(899999L), Some(899999L))), got)
    assert(got(9L) == ((1L, 1L, Some(600000L), Some(600000L))), got)
    assert(got.size == 5, got)
  }

  test("dedup savings: dropped docs/chars/tokens replay by hand") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_dv").toString
    // Docs 1,2 clones (keeper 1), doc 3 singleton. Dropped: doc 2 =
    // 9 chars, 5 tokens of totals 27/15 -> every share 333333.
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z w v"))
    docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Registry.queries("tdp_dedup_savings")(spark, dir).collect()
    assert(got.length == 1, got.toSeq)
    val r = got(0)
    assert((r.getAs[Long]("n_docs"), r.getAs[Long]("n_dropped"),
      r.getAs[Long]("total_chars"), r.getAs[Long]("dropped_chars"),
      r.getAs[Long]("total_tokens"), r.getAs[Long]("dropped_tokens"),
      r.getAs[Long]("doc_save_micro"), r.getAs[Long]("char_save_micro"),
      r.getAs[Long]("token_save_micro")) ==
      ((3L, 1L, 27L, 9L, 15L, 5L, 333333L, 333333L, 333333L)), r)
  }

  test("ivf balance: cells partition the corpus, imbalance >= 1") {
    // Consistency on the real sf0.001 embeddings: populated + empty
    // cells account for the nlist heads, every vector sits in exactly
    // one cell, and max*n_cells >= n_vecs forces imbalance >= 10^6.
    val dir = "/root/testdata/sf0.001"
    val got = Registry.queries("tdp_ivf_balance")(spark, dir).collect()
    assert(got.length == 1, got.toSeq)
    val r = got(0)
    val nEmb = Registry.table(spark, dir, "embeddings").count()
    assert(r.getAs[Long]("n_vecs") == nEmb, r)
    assert(r.getAs[Long]("n_cells") + r.getAs[Long]("n_empty_cells")
      == 64L, r)
    assert(r.getAs[Long]("min_cell") <= r.getAs[Long]("mean_cell")
      && r.getAs[Long]("mean_cell") <= r.getAs[Long]("max_cell"), r)
    assert(r.getAs[Long]("imbalance_micro") >= 1000000L, r)
  }

  test("cluster purity: mixed-language cluster replays by hand") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_cp").toString
    // Cluster {1,2,3}: en,en,fr -> mixed, majority 2/3. Cluster {4,5}:
    // both en -> pure. mean majority = (666666 + 1000000) div 2.
    val docs = Seq(
      (1L, "a b c d e", "en"), (2L, "a b c d e", "en"),
      (3L, "a b c d e", "fr"),
      (4L, "x y z w v", "en"), (5L, "x y z w v", "en"))
    docs.map { case (id, t, l) => (id, t, l, "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Registry.queries("tdp_cluster_purity")(spark, dir).collect()
    assert(got.length == 1, got.toSeq)
    val r = got(0)
    assert((r.getAs[Long]("n_multi_clusters"),
      r.getAs[Long]("pure_clusters"), r.getAs[Long]("docs_in_pure"),
      r.getAs[Long]("docs_in_mixed"),
      r.getAs[Long]("mean_maj_share_micro")) ==
      ((2L, 1L, 2L, 3L, 833333L)), r)
  }

  test("hapax share: corpus-frequency-1 tokens attribute to sources") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_hx").toString
    // s1: 'a b a' (freqs a=2 local). s2: 'b c'. Corpus freq a=2, b=2,
    // c=1 -> hapax {c}, owned by s2.
    val docs = Seq((1L, "a b a", "s1"), (2L, "b c", "s2"))
    docs.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Registry.queries("tdp_hapax_share")(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("vocab_size"),
          r.getAs[Long]("n_hapax"), r.getAs[Long]("hapax_occ_micro"),
          r.getAs[Long]("hapax_vocab_micro"))).toMap
    assert(got("s1") == ((3L, 2L, 0L, 0L, 0L)), got)
    assert(got("s2") == ((2L, 2L, 1L, 500000L, 500000L)), got)
  }

  test("length-quality slope: rational least squares replays by hand") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_lq").toString
    // Points (tokens, micro-quality): (1, 899999), (2, 720000),
    // (3, 540000) -> num = 3*3959999 - 6*2159999 = -1079997, den = 6,
    // sign-split slope = -179999500000.
    val docs = Seq((1L, "abcd"), (2L, "ab cd"), (3L, "a b c"))
    docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Registry.queries("tdp_len_quality_slope")(spark, dir)
      .collect()
    assert(got.length == 1, got.toSeq)
    val r = got(0)
    assert((r.getAs[Long]("n"), r.getAs[Long]("sx"), r.getAs[Long]("sy"),
      r.getAs[Long]("sxx"), r.getAs[Long]("sxy"),
      r.getAs[Long]("slope_micro_per_token")) ==
      ((3L, 6L, 2159999L, 14L, 3959999L, -179999500000L)), r)
  }

  test("dedup pipeline: stage attribution, invariants, savings reconcile") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_pipe").toString
    // Exact dups (ids 0,1: identical text) land in the SAME near-dup
    // cluster as the whitespace near-dup (id 2: same token/shingle set,
    // different md5 — trailing space), so the exact stage drops 1 and
    // the near-dup stage drops 2 more; ids 10/11 are a pure near-dup
    // pair (no exact dup); 20 is unique. Final keepers: 0, 10, 20.
    val xa = "alpha beta gamma delta epsilon zeta eta theta"
    val ya = "one two three four five six seven eight nine"
    val docs = Seq(
      (0L, xa), (1L, xa), (2L, xa + " "),
      (10L, ya), (11L, ya + " "), (20L, "lone unique document here"))
    docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = Registry.queries("tdp_dedup_pipeline")(spark, dir)
      .collect().head
    assert((r.getAs[Long]("n_docs"), r.getAs[Long]("n_after_exact"),
      r.getAs[Long]("n_clusters"), r.getAs[Long]("n_final"),
      r.getAs[Long]("n_dropped_exact"),
      r.getAs[Long]("n_dropped_neardup")) ==
      ((6L, 5L, 3L, 3L, 1L, 2L)), r)
    assert(r.getAs[Boolean]("exact_dup_free")
      && r.getAs[Boolean]("near_dup_free")
      && r.getAs[Long]("n_residual_pairs") == 0L
      && r.getAs[Boolean]("final_equals_clusters"), r)
    // End-state reconciles with the standalone per-stage operators on
    // the same corpus: total dropped == tdp_dedup_savings' n_dropped,
    // cluster census == tdp_dup_rate's.
    val sv = Registry.queries("tdp_dedup_savings")(spark, dir)
      .collect().head
    assert(sv.getAs[Long]("n_dropped") ==
      r.getAs[Long]("n_dropped_exact") + r.getAs[Long]("n_dropped_neardup"),
      sv)
    val dr = Registry.queries("tdp_dup_rate")(spark, dir).collect().head
    assert(dr.getLong(1) == r.getAs[Long]("n_clusters"), dr)
    // The quality-keeper variant keeps one doc per cluster too, and its
    // total gain reconciles with the standalone keep-best rows.
    val kb = Registry.queries("tdp_pipeline_keep_best")(spark, dir)
      .collect().head
    assert(kb.getAs[Long]("n_final") == 3L, kb)
    assert(kb.getAs[Boolean]("gain_matches_keep_best"), kb)
  }

  test("source percentiles: nearest-rank order statistics replay by hand") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_spct").toString
    // Source A: 10 docs of 1..10 tokens -> k50=5, k90=9, k99=10 ->
    // p50=5, p90=9, p99=10. Source B: lengths (5,5,7) -> k50=2 -> 5,
    // k90=k99=3 -> 7.
    val docs =
      (1 to 10).map(n => (n.toLong, Seq.fill(n)("w").mkString(" "), "A")) ++
        Seq((21L, "a b c d e", "B"), (22L, "f g h i j", "B"),
          (23L, "k l m n o p q", "B"))
    docs.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Registry.queries("tdp_source_percentiles")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(("A", 10L, 5L, 9L, 10L), ("B", 3L, 5L, 7L, 7L)), got)
  }

  test("content chunks: CDC boundaries and cross-doc chunk dedup by hand") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_cdc").toString
    // polyhash("bb") = 3136 ≡ 0 (mod 64): 'bb' is the one boundary
    // token. Chunk index counts boundaries strictly BEFORE the
    // position, so the boundary token CLOSES its chunk and the next
    // token opens one: doc1 "aa bb cat dog" -> [aa bb][cat dog],
    // doc2 "cat dog bb cat dog" -> [cat dog bb][cat dog]. The
    // [cat dog] chunk recurs in doc 2 under a DIFFERENT prefix --
    // the content-anchored dedup CDC exists for (5 chunks, 4
    // distinct, 1 dup instance of 2 tokens over 10 total).
    val docs = Seq((1L, "aa bb cat dog"), (2L, "cat dog bb cat dog"),
      (3L, "aa"))
    docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = Registry.queries("tdp_content_chunks")(spark, dir)
      .collect().head
    assert((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_distinct_chunks"),
      r.getAs[Long]("n_dup_instances"),
      r.getAs[Long]("chunk_tokens_total"), r.getAs[Long]("dup_tokens"),
      r.getAs[Long]("mean_chunk_toks_micro"),
      r.getAs[Long]("chunk_save_micro")) ==
      ((5L, 4L, 1L, 10L, 2L, 2000000L, 200000L)), r)
  }

  test("shingle containment: prefix inclusion scores asymmetrically") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_cont").toString
    // Doc 2 = doc 1 plus one trailing token: doc 1's 7 shingles are a
    // SUBSET of doc 2's 8 -> containment(1|2) = 1.0 exactly while
    // Jaccard is only 7/8 — the inclusion signal the symmetric score
    // under-reports. (J = 0.875 keeps the pair inside the LSH bands.)
    val a = "w1 w2 w3 w4 w5 w6 w7 w8 w9"
    val docs = Seq((1L, a), (2L, a + " z9"))
    docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Registry.queries("tdp_shingle_containment")(spark, dir)
      .collect()
    assert(got.length == 1, got.toSeq)
    val r = got.head
    assert((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
      r.getAs[Long]("n_sh_a"), r.getAs[Long]("n_sh_b"),
      r.getAs[Long]("inter"), r.getAs[Long]("cont_a_micro"),
      r.getAs[Long]("cont_b_micro"), r.getAs[Boolean]("near_contained")) ==
      ((1L, 2L, 7L, 8L, 7L, 1000000L, 875000L, true)), r)
  }

  test("nondup negatives: no returned pair shares a near-dup cluster") {
    val dir = sf
    val hn = Registry.queries("tdp_nondup_negatives")(spark, dir)
      .select("q_id", "c_id")
    val cl = Registry.queries("tdp_dup_clusters")(spark, dir)
      .select("doc_id", "cluster_id")
    val offenders = hn
      .join(cl.withColumnRenamed("doc_id", "q_id")
        .withColumnRenamed("cluster_id", "qc"), "q_id")
      .join(cl.withColumnRenamed("doc_id", "c_id")
        .withColumnRenamed("cluster_id", "cc2"), "c_id")
      .filter(col("qc") === col("cc2"))
      .count()
    assert(offenders == 0L, s"$offenders mined negatives are near-dups")
    // every query with a non-empty bucket mines at most 3
    val over = hn.groupBy("q_id").count().filter(col("count") > 3).count()
    assert(over == 0L)
  }

  test("modularity and diameter sweep: two planted pair-communities") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_mod").toString
    // Two disjoint whitespace-clone pairs -> LSH edges (1,2) and
    // (10,11); LPA gives each pair its own community. M = 4 symmetric
    // rows, per community e2 = 2 and d = 2: s_intra = 16, s_dsq = 8 ->
    // Q = 8/16 = 0.5, coverage = 1.0. Diameter: all degrees 1, seed =
    // min id 1, both eccentricities 1, nothing capped.
    val xa = "p q r s t u v w x"
    val ya = "aa bb cc dd ee ff gg hh ii"
    val docs = Seq((1L, xa), (2L, xa + " "), (10L, ya), (11L, ya + " "))
    docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val m = Registry.queries("tdp_modularity")(spark, dir).collect().head
    assert((m.getAs[Long]("n_edges"), m.getAs[Long]("n_communities"),
      m.getAs[Long]("n_intra_edges"), m.getAs[Long]("coverage_micro"),
      m.getAs[Long]("modularity_micro")) ==
      ((2L, 2L, 2L, 1000000L, 500000L)), m)
    val d = Registry.queries("tdp_diameter_sweep")(spark, dir)
      .collect().head
    assert((d.getAs[Long]("seed"), d.getAs[Long]("ecc_seed"),
      d.getAs[Long]("n_reached_seed"), d.getAs[Long]("far_vertex"),
      d.getAs[Long]("ecc_far"), d.getAs[Long]("diameter_lb"),
      d.getAs[Boolean]("capped")) == ((1L, 1L, 2L, 2L, 1L, 1L, false)), d)
  }

  test("chao1 richness: bias-corrected estimator replays by hand") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_chao").toString
    // One source, token freqs a:2 b:1 c:2 d:1 -> V=4, n1=2, n2=2,
    // chao1 = 4e6 + (2*1*1e6) div (2*3) = 4333333,
    // unseen = (333333 * 1e6) div 4333333 = 76923.
    Seq((1L, "a a b c", "en", "s1", 7L), (2L, "c d", "en", "s1", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = Registry.queries("tdp_chao1_richness")(spark, dir)
      .collect().head
    assert((r.getAs[String]("source"), r.getAs[Long]("vocab"),
      r.getAs[Long]("n1"), r.getAs[Long]("n2"),
      r.getAs[Long]("chao1_micro"), r.getAs[Long]("unseen_micro")) ==
      (("s1", 4L, 2L, 2L, 4333333L, 76923L)), r)
  }

  test("source gini: Lorenz concentration replays by hand") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_gini").toString
    // Source A: 1 token / 1 doc; source B: 3 tokens / 1 doc.
    // Token Gini = ((-1)*1 + (1)*3) / (2*4) = 0.25; doc Gini = 0.
    Seq((1L, "x", "en", "A", 1L), (2L, "y y y", "en", "B", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = Registry.queries("tdp_source_gini")(spark, dir).collect().head
    assert((r.getAs[Long]("n_sources"), r.getAs[Long]("token_gini_micro"),
      r.getAs[Long]("doc_gini_micro")) == ((2L, 250000L, 0L)), r)
  }

  test("containment estimator: exact clones estimate with zero error") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_cest").toString
    // Identical shingle sets -> all 8 signatures agree -> est = 8·2n·1e6
    // div (16·n) = 1e6 both ways, exact containment = 1e6 -> MAE 0.
    val t = "w1 w2 w3 w4 w5 w6 w7 w8 w9"
    Seq((1L, t), (2L, t + " "))
      .map { case (id, x) => (id, x, "en", "s", x.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = Registry.queries("tdp_containment_est")(spark, dir)
      .collect().head
    assert((r.getAs[Long]("n_pairs"), r.getAs[Long]("mae_a_micro"),
      r.getAs[Long]("mae_b_micro"), r.getAs[Long]("max_err_a"),
      r.getAs[Long]("max_err_b")) == ((1L, 0L, 0L, 0L, 0L)), r)
  }

  test("louvain local move: hand graph gains, stability, and exact Q") {
    import spark.implicits._
    // Two triangles {0,1,2} and {3,4,5} bridged by 2-3: m = 7, m2 = 14.
    val pairs = Seq((0L, 1L), (0L, 2L), (1L, 2L),
      (3L, 4L), (3L, 5L), (4L, 5L), (2L, 3L))
    val edges = pairs.toDF("a", "b")
      .select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.toDF("a", "b")
        .select(col("b").as("src"), col("a").as("dst")))
    // Perfect partition (triangle membership): Q = 6/7 - 2*(7/14)^2 =
    // 0.357142..., exact micro 70e6 div 196 = 357142; no vertex moves.
    val perfect = Seq((0L, 0L), (1L, 0L), (2L, 0L),
      (3L, 3L), (4L, 3L), (5L, 3L)).toDF("doc_id", "lab")
    val qp = TdpQueries.qMicro(edges, perfect).collect().head
    assert((qp.getAs[Long]("n_comm"), qp.getAs[Long]("q_micro")) ==
      ((2L, 357142L)), qp)
    val stay = TdpQueries.louvainMoves(edges, perfect)
      .filter(col("new_lab") =!= col("a")).count()
    assert(stay == 0L, "perfect partition must be locally optimal")
    // Corrupt vertex 2 into community B: its gains are
    // score(A) = 14*2 - 3*4 = 16 > score(B) = 14*1 - 3*(10-3) = -7,
    // so EXACTLY vertex 2 moves (back to A); hand-checked scores for
    // all other vertices keep them in place. Q goes 122448 -> 357142.
    val corrupted = Seq((0L, 0L), (1L, 0L), (2L, 3L),
      (3L, 3L), (4L, 3L), (5L, 3L)).toDF("doc_id", "lab")
    val qc = TdpQueries.qMicro(edges, corrupted).collect().head
    assert(qc.getAs[Long]("q_micro") == 122448L, qc)
    val moves = TdpQueries.louvainMoves(edges, corrupted)
    val movedRows = moves.filter(col("new_lab") =!= col("a")).collect()
    assert(movedRows.length == 1 &&
      movedRows.head.getAs[Long]("doc_id") == 2L &&
      movedRows.head.getAs[Long]("new_lab") == 0L,
      movedRows.mkString(", "))
    val healed = moves.select(col("doc_id"), col("new_lab").as("lab"))
    assert(TdpQueries.qMicro(edges, healed).collect().head
      .getAs[Long]("q_micro") == 357142L,
      "one local move must restore the optimal partition's Q")
  }

  test("weighted monotone louvain sweep: merges happen, swaps cannot") {
    import spark.implicits._
    // Coarse 2-node graph (the tdp_louvain_coarsen shape): communities
    // 1 and 2, one intra edge each (self-loop weight 2 in the
    // directed-both-ways convention), FOUR cross edges (w(1,2) =
    // w(2,1) = 4). m2 = 12, k1 = k2 = 6.
    val coarse = Seq((1L, 1L, 2L), (2L, 2L, 2L), (1L, 2L, 4L),
      (2L, 1L, 4L)).toDF("src", "dst", "w")
    val singles = Seq((1L, 1L), (2L, 2L)).toDF("doc_id", "lab")
    // UNRESTRICTED synchronous sweep: node 1's gain toward 2 and node
    // 2's toward 1 are both 12*4 - 6*6 = 12 > 0, so the two communities
    // SWAP labels — 2 reported moves, partition unchanged: the
    // oscillation the monotone rule exists to kill.
    val swap = TdpQueries.louvainMoves(coarse, singles, weighted = true)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("new_lab"))).toSet
    assert(swap == Set((1L, 2L), (2L, 1L)), s"expected the swap, got $swap")
    // MONOTONE sweep (tdp_louvain_coarsen's rule): node 1 may only
    // consider c <= 1, so it stays; node 2 still sees the +12 gain
    // toward 1 and moves — exactly ONE move, a real merge.
    val mono = TdpQueries.louvainMoves(coarse, singles,
        weighted = true, monotone = true)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("new_lab"))).toSet
    assert(mono == Set((1L, 1L), (2L, 1L)), s"expected one merge, got $mono")
    // Two well-separated communities must NOT merge under the same
    // rule: triangles bridged by one edge coarsen to self-loop weight 6
    // each and cross weight 1 — node 3's gain toward 0 is
    // 14*1 - 7*7 = -35 < 0, so both stay (separate IS Q-optimal:
    // 0.357 vs 0 merged).
    val tri = Seq((0L, 0L, 6L), (3L, 3L, 6L), (0L, 3L, 1L),
      (3L, 0L, 1L)).toDF("src", "dst", "w")
    val triLbl = Seq((0L, 0L), (3L, 3L)).toDF("doc_id", "lab")
    val stay = TdpQueries.louvainMoves(tri, triLbl,
        weighted = true, monotone = true)
      .filter(col("new_lab") =!= col("a")).count()
    assert(stay == 0L, "separated triangle communities must not merge")
  }

  test("NFD fold: hand histogram packs exactly like the walked sequence") {
    // C = 10, items desc 6,6,4,3,3,3. Walked by hand: bin1=[6] (next 6
    // doesn't fit, pad 4), bin2=[6,4] (3 doesn't fit, pad 0),
    // bin3=[3,3,3] (pad 1) -> 3 bins, pad 5 = 3*10 - 25.
    assert(TdpQueries.nfdFold(Seq((6L, 2L), (4L, 1L), (3L, 3L)), 10L) ==
      ((3L, 5L)))
    // Closed-form batching inside one length: 7 items of 3 into C = 10
    // -> bins of 3+3+3 (pad 1 each when closed): bins [3,3,3],[3,3,3],
    // [3] -> 3 bins, pad = 30 - 21 = 9.
    assert(TdpQueries.nfdFold(Seq((3L, 7L)), 10L) == ((3L, 9L)))
    // Exact fit leaves zero padding.
    assert(TdpQueries.nfdFold(Seq((5L, 4L)), 10L) == ((2L, 0L)))
    // Empty histogram: no bins, no padding.
    assert(TdpQueries.nfdFold(Nil, 10L) == ((0L, 0L)))
    // The accounting identity holds on an awkward mix.
    val hist = Seq((9L, 3L), (7L, 2L), (2L, 11L), (1L, 5L))
    val (b, p) = TdpQueries.nfdFold(hist, 10L)
    val toks = hist.map { case (l, k) => l * k }.sum
    assert(p == b * 10L - toks, s"bins=$b pad=$p toks=$toks")
  }

  test("soft dedup: cluster-size bands weight 1/n, singleton soft == hard") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_soft").toString
    // 3-clone cluster (8 tokens each), 2-clone cluster (9 tokens each),
    // one unique doc (7 tokens): identical texts share every minhash
    // band, distinct texts share none.
    val tri = "alpha beta gamma delta epsilon zeta eta theta"
    val duo = "one two three four five six seven eight nine"
    val solo = "red orange yellow green blue indigo violet"
    (Seq((0L, tri), (1L, tri), (2L, tri), (10L, duo), (11L, duo),
      (20L, solo)))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val rows = Registry.queries("tdp_soft_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet === Set(1L, 2L, 3L), s"bands: ${rows.keySet}")
    val b3 = rows(3L)
    assert(b3.getAs[Long]("n_clusters") == 1L)
    assert(b3.getAs[Long]("tokens_total") == 24L)
    assert(b3.getAs[Long]("tokens_hard_kept") == 8L)
    // soft mass: 24 tokens x (10^6 div 3) = 24 x 333333.
    assert(b3.getAs[Long]("soft_mass_micro") == 24L * 333333L)
    assert(b3.getAs[Long]("soft_minus_hard_micro") ==
      24L * 333333L - 8L * 1000000L)
    val b2 = rows(2L)
    assert(b2.getAs[Long]("soft_mass_micro") == 18L * 500000L)
    assert(b2.getAs[Long]("tokens_hard_kept") == 9L)
    // The singleton band is the exactness certificate: weight 10^6
    // makes the two policies IDENTICAL, bit for bit.
    val b1 = rows(1L)
    assert(b1.getAs[Long]("soft_mass_micro") ==
      b1.getAs[Long]("hard_mass_micro"))
    assert(b1.getAs[Long]("soft_minus_hard_micro") == 0L)
  }

  test("randomized response: hand-replayed mechanism and exact debias") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_rr").toString
    val vocab = Seq("de", "en", "es", "fr", "zh")
    val docs = (0L until 40L).map(i => (i, vocab((i % 5).toInt)))
    docs.toDF("doc_id", "lang").write.parquet(s"$dir/documents.parquet")
    // Replay the mechanism with the same overflow-safe Knuth hash.
    val P = 1000000007L
    def h(id: Long): Long = (id % P) * 2654435761L % P
    val reported = docs.map { case (id, lang) =>
      val hv = h(id)
      if (hv % 4 == 0) vocab(((hv / 4) % 5).toInt) else lang
    }
    val trueC = docs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val repC = reported.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = docs.size.toLong
    val out = Registry.queries("tdp_randomized_response")(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet === vocab.toSet)
    var estNumSum = 0L
    for (l <- vocab) {
      val r = out(l)
      assert(r.getAs[Long]("n_true") == trueC.getOrElse(l, 0L))
      assert(r.getAs[Long]("n_reported") == repC.getOrElse(l, 0L))
      val num = 20L * repC.getOrElse(l, 0L) - n
      assert(r.getAs[Long]("est_num") == num)
      val est = if (num >= 0) num * 1000000L / 15L
        else -((-num) * 1000000L / 15L)
      assert(r.getAs[Long]("est_micro") == est)
      assert(r.getAs[Long]("err_micro") ==
        est - trueC.getOrElse(l, 0L) * 1000000L)
      estNumSum += num
    }
    // Conservation: sum_j (20 c_j - n) = 20n - 5n = 15n exactly.
    assert(estNumSum == 15L * n)
  }

  test("doremi mix: worst-served domain upweights, trajectory is chained") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tdp_doremi").toString
    // Four domains share one 16-token pool; zh uses a DISJOINT 16-token
    // vocabulary. At uniform weights the shared pool out-scores zh 4:1,
    // so the K=16 mixture lexicon is exactly the shared pool: zh's
    // held-out stream is fully out-of-lexicon (excess 10^6) while every
    // other domain's excess is 0 -> round 0 must upweight zh and only zh.
    val pool = (1 to 16).map(i => s"w$i").mkString(" ")
    val zhTxt = (1 to 16).map(i => s"z$i").mkString(" ")
    val langs = Seq("de", "en", "es", "fr", "zh")
    val docs = for {
      (l, li) <- langs.zipWithIndex
      j <- 0 until 10
    } yield (li * 10L + j, if (l == "zh") zhTxt else pool, l)
    docs.toDF("doc_id", "text", "lang")
      .write.parquet(s"$dir/documents.parquet")
    val out = Registry.queries("tdp_doremi_mix")(spark, dir).collect()
    assert(out.length == 30, "6 rounds x 5 domains")
    val byKey = out.map(r =>
      (r.getAs[Long]("round"), r.getAs[String]("lang")) -> r).toMap
    for (l <- langs) {
      val r0 = byKey((0L, l))
      assert(r0.getAs[Long]("w_micro") == 200000L, "round 0 is uniform")
      if (l == "zh") {
        assert(r0.getAs[Long]("excess_micro") == 1000000L)
        assert(r0.getAs[Long]("w_next_micro") > 200000L)
      } else {
        assert(r0.getAs[Long]("excess_micro") == 0L)
        assert(r0.getAs[Long]("w_next_micro") < 200000L)
      }
      // Chained state: round r's w_next IS round r+1's w, and the
      // uniform-smoothing floor c/k = 40000 always holds.
      for (r <- 0L until 5L) {
        assert(byKey((r, l)).getAs[Long]("w_next_micro") ==
          byKey((r + 1, l)).getAs[Long]("w_micro"))
        assert(byKey((r, l)).getAs[Long]("w_next_micro") >= 40000L)
      }
    }
  }

  test("leiden refinement: disconnected community splits, connected stays") {
    import spark.implicits._
    // Two disjoint triangles {0,1,2} and {10,11,12} planted under ONE
    // label (the Louvain stranding defect), plus a connected path
    // {20,21,22} under its own label. Refinement must split the former
    // into its two components and leave the latter whole.
    val und = Seq((0L, 1L), (1L, 2L), (0L, 2L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L), (21L, 22L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val labels = Seq(0L, 1L, 2L, 10L, 11L, 12L).map((_, 0L))
      .++(Seq(20L, 21L, 22L).map((_, 20L)))
      .toDF("doc_id", "lab")
    val ref = TdpQueries.refineWithinCommunities(spark, edges, labels)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    for (v <- Seq(0L, 1L, 2L)) assert(ref(v) == ((0L, 0L)))
    for (v <- Seq(10L, 11L, 12L)) assert(ref(v) == ((0L, 10L)))
    for (v <- Seq(20L, 21L, 22L)) assert(ref(v) == ((20L, 20L)))
    // Pieces never cross parent communities even when ids interleave.
    assert(ref.values.toSet.size == 3)
  }
}
