package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.queries.TdpQueries.{polyHashExpr, toksExpr}

/** Streaming near-duplicate detection over a document stream — the
  * arrival-time twin of the batch `tdp_incremental_dedup` /
  * `tdp_minhash_lsh_pairs` operators (reference:
  * `/root/reference/` has no streaming surface; this extends the dedup
  * family to the delivery-time shape a training-data pipeline runs).
  *
  * Same MinHash-LSH construction as the batch family (identical
  * permutation constants and 4 x 2 banding, so batch and stream agree on
  * what a candidate is), but incremental: state is ONE long per live
  * (band, signature) bucket — the minimum doc_id ever seen in it — and
  * buckets expire once the event-time watermark passes their horizon, so
  * state is bounded by the live-window bucket count no matter how much
  * history has streamed through. A clone arriving after its bucket
  * expired reports as novel — the same watermark-bounded guarantee every
  * streaming dedup here offers (cf. [[EventsStream.dedupByContent]]).
  */
object DocsStream {

  final case class BandRow(doc_id: Long, ts: Timestamp, band: Int, sig: String)

  /** One verdict per (doc, band): `earlier_doc` is the smallest doc_id
    * that shared this band bucket before this doc (its near-dup
    * evidence), or -1 when the doc opened the bucket. A document's
    * overall verdict is the min non-negative `earlier_doc` over its four
    * bands — a per-batch groupBy any consumer (e.g. `foreachBatch`) can
    * run without more streaming state.
    */
  final case class BandVerdict(doc_id: Long, band: Int, earlier_doc: Long)

  // Public: Dataset encoders codegen constructor calls for state classes,
  // which janino cannot emit against a private nested case class.
  final case class BucketMin(minDoc: Long)

  /** Band-level near-dup verdicts for a stream of documents
    * (`doc_id`, `ts`, `text`). In-batch ties resolve in doc_id order
    * (min wins — the batch family's keep-first policy); cross-batch,
    * whoever arrived first owns the bucket.
    */
  def nearDupBands(
      docs: DataFrame, horizonSec: Long = 7200L): Dataset[BandVerdict] = {
    val s = docs.sparkSession
    graft.expressions.GraftExtensions.registerAll(s)
    import s.implicits._

    // r14: same native tokenize -> fused shingle-hash -> one-pass
    // 8-permutation minima chain as the batch signature frames
    // (TdpQueries.minhashSigCols) — value-identical to the former
    // interpreted transform chain.
    val sigDf = docs
      .withColumn("toks", expr(toksExpr))
      .withColumn("hashes", expr("graft_shingle_hashes(toks)"))
      .filter(size(col("hashes")) > 0)
      .select(col("doc_id") +: col("ts") +:
        graft.queries.TdpQueries.minhashSigCols: _*)
    val bandStructs = (0 until 4).map { band =>
      struct(lit(band).as("band"),
        concat_ws(":", col(s"mh${2 * band}"), col(s"mh${2 * band + 1}"))
          .as("sig"))
    }
    val bands = sigDf
      .select(col("doc_id"), col("ts"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("ts"),
        col("bs.band").as("band"), col("bs.sig").as("sig"))
      .as[BandRow]

    def update(
        key: (Int, String),
        rows: Iterator[BandRow],
        state: GroupState[BucketMin]): Iterator[BandVerdict] = {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        val sorted = rows.toList.sortBy(_.doc_id)
        var minSoFar =
          state.getOption.map(_.minDoc).getOrElse(Long.MaxValue)
        var maxTsMs = 0L
        val out = sorted.map { r =>
          val earlier = if (minSoFar == Long.MaxValue) -1L else minSoFar
          if (r.doc_id < minSoFar) minSoFar = r.doc_id
          if (r.ts.getTime > maxTsMs) maxTsMs = r.ts.getTime
          BandVerdict(r.doc_id, key._1, earlier)
        }
        state.update(BucketMin(minSoFar))
        // Expire the bucket once event time moves a full horizon past the
        // newest member — bounded state, watermark-bounded memory.
        state.setTimeoutTimestamp(maxTsMs + horizonSec * 1000L)
        out.iterator
      }
    }

    bands
      .withWatermark("ts", s"$horizonSec seconds")
      .groupByKey(r => (r.band, r.sig))
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }

  /** Bloom-prefiltered corpus-novelty verdicts for a document stream —
    * the streaming twin of the batch `tdp_bloom_dedup` miss-skip. The
    * static corpus's content-hash set is folded ONCE into a
    * `graft_bloom_agg` sketch (a distributed aggregate whose OR-merged
    * partials return a few-hundred-KB byte array to the driver — sized by
    * key count, never by data) and embedded in the streaming plan as a
    * literal, probed by `graft_bloom_contains` inside whole-stage codegen.
    *
    * The miss-skip is STRUCTURAL, not advisory: the plan is a union of
    * two legs, and the bloom-miss leg — definitively novel, Bloom has no
    * false negatives — contains no join at all; only probe-positive rows
    * enter the stream-static verify join, where false positives die. So
    * every micro-batch joins `|already-seen|·(1+fpp)` rows instead of
    * `|batch|`, and the verdicts are EXACTLY the exact-membership answer.
    * At 100 TB this is the stage that runs BEFORE [[nearDupBands]]:
    * corpus-known documents need no LSH state at all.
    */
  def bloomNovelty(
      docs: DataFrame, corpus: DataFrame, fpp: Double = 0.01): DataFrame = {
    val s = docs.sparkSession
    graft.expressions.GraftExtensions.registerAll(s)
    // Persisted: the hash frame is consumed three times (count to size the
    // sketch, the bloom fold, and the stream-static verify join every
    // micro-batch) — without the persist each consumer rescans and
    // re-hashes the raw corpus.
    val corpusH = corpus.select(xxhash64(col("text")).as("h")).distinct().persist()
    // Production pattern: the key count is one cheap agg away (or a
    // catalog stat); it sizes the sketch BEFORE the fold.
    val nCorpus = math.max(corpusH.count(), 1L)
    val bloomBytes = corpusH
      .agg(call_function("graft_bloom_agg", col("h"),
        lit(nCorpus), lit(fpp)).as("bf"))
      .head().getAs[Array[Byte]](0)
    val hashed = docs.select(col("doc_id"), xxhash64(col("text")).as("h"))
    val probe =
      call_function("graft_bloom_contains", col("h"), lit(bloomBytes))
    val misses = hashed.filter(!probe)
      .select(col("doc_id"),
        lit(false).as("bloom_hit"), lit(false).as("known"))
    val hits = hashed.filter(probe)
      .join(corpusH.withColumn("in_corpus", lit(true)), Seq("h"), "left")
      .select(col("doc_id"), lit(true).as("bloom_hit"),
        coalesce(col("in_corpus"), lit(false)).as("known"))
    misses.unionByName(hits)
  }

  /** STREAMING Count-Min token sketch: the corpus frequency summary
    * maintained INSIDE the streaming aggregation state. Each micro-batch
    * folds its tokens into `graft_cms_agg`'s 16 KB buffer; Spark's state
    * store carries the partial between batches and merges with the
    * sketch's element-wise counter add — commutative and associative, so
    * the sketch after the last batch is BIT-IDENTICAL to a batch fold of
    * the same feed no matter how the stream was micro-batched
    * (StreamingParitySpec proves equality against the batch twin). This
    * is the always-on ingest monitor: heavy hitters / frequency
    * estimates are one `graft_cms_estimate` probe against the latest
    * emitted sketch, with CMS's no-undercount guarantee intact. State is
    * O(D x W) counters regardless of stream length or vocabulary.
    */
  final case class BucketState(counts: Map[Long, Long])
  final case class BucketRow(source: String, i: Long, n: Long)

  /** Streaming per-source log-bucket quantile histogram — the
    * incremental twin of the batch `tdp_quantile_sketch` device (values
    * < 16 exact, else 16 sub-buckets per power of two from bit-length +
    * shift: pure integer arithmetic, no libm, so stream and batch land
    * every value in the same bucket). State per source is the
    * bucket→count map — bounded by the VALUE range (≤ 16·log2(max)
    * entries), never by stream length — and the fold is counter
    * addition: commutative and associative, so the stream's
    * batch-by-batch fold equals the batch shuffle's partial-aggregation
    * merge EXACTLY (the same mergeability argument, different execution
    * model). Emits the full per-source state each micro-batch (Update
    * mode); the last emit per (source, bucket) is the sketch of
    * everything seen, which StreamingParitySpec hash-compares against
    * the batch histogram on the same feed.
    */
  def lengthSketch(docs: DataFrame): Dataset[BucketRow] = {
    val s = docs.sparkSession
    import s.implicits._
    val li = docs
      .withColumn("x", size(expr(toksExpr)).cast("long"))
      .withColumn("i",
        expr("""CASE WHEN x < 16 THEN x ELSE
               |  (length(bin(x)) - 1 - 4) * 16
               |    + shiftright(x, CAST(length(bin(x)) - 1 - 4 AS INT))
               |END""".stripMargin))
      .select(col("source").as("src"), col("i"))
      .as[(String, Long)]

    def update(
        src: String,
        rows: Iterator[(String, Long)],
        state: GroupState[BucketState]): Iterator[BucketRow] = {
      val cur = state.getOption.map(_.counts).getOrElse(Map.empty[Long, Long])
      val add = rows.foldLeft(Map.empty[Long, Long]) { case (m, (_, i)) =>
        m.updated(i, m.getOrElse(i, 0L) + 1L)
      }
      val merged = (cur.keySet ++ add.keySet).iterator
        .map(k => k -> (cur.getOrElse(k, 0L) + add.getOrElse(k, 0L))).toMap
      state.update(BucketState(merged))
      merged.toSeq.sortBy(_._1)
        .map { case (i, n) => BucketRow(src, i, n) }.iterator
    }

    li.groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(update)
  }

  def tokenSketch(docs: DataFrame, width: Int = 512): DataFrame = {
    val s = docs.sparkSession
    graft.expressions.GraftExtensions.registerAll(s)
    docs
      .select(explode(expr(toksExpr)).as("tok"))
      .select(expr(polyHashExpr("tok")).as("key"))
      .agg(call_function("graft_cms_agg", col("key"), lit(width)).as("cms"))
  }
}
