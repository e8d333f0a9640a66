package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Streaming MULTIMODAL ingest: the codec kernels run inside a streaming
  * plan. Decode is stateless per row, so `mapPartitions` at the codec
  * boundary composes with Structured Streaming exactly as it does with
  * batch — each micro-batch decodes its own files, and everything
  * downstream of the 8-byte-per-clip signature is the relational
  * machinery the batch family already audits.
  */
object MediaStream {

  /** Streaming audio-novelty verdicts — the multimodal twin of
    * [[DocsStream.bloomNovelty]], with the batch `tdp_audio_fingerprint`
    * as its batch counterpart: an arriving clip decodes to its
    * full-stream PCM fold (`Multimodal.wavFingerprint`), a Bloom sketch
    * of the corpus's folds probes it in codegen, and only probe-positive
    * clips enter the stream-static verify join where Bloom false
    * positives die. The miss leg is STRUCTURALLY join-free (Bloom has no
    * false negatives: a missed fold is definitively novel), so at
    * 100 TB/day of media the join cost scales with |already-seen|·(1+fpp)
    * rather than the stream rate — and the corpus audio itself never
    * shuffles; its 8-byte folds do.
    */
  def audioNovelty(
      ids: Dataset[Long],
      corpusIds: Dataset[Long],
      fpp: Double = 0.01): DataFrame = {
    val s = ids.sparkSession
    graft.expressions.GraftExtensions.registerAll(s)
    // Batch side: decode the corpus ONCE, keep only the folds (persisted:
    // consumed by the count, the bloom fold and every micro-batch's
    // verify join).
    val corpusH = Multimodal.wavFingerprint(corpusIds)
      .toDF().select(col("full_hash").as("h")).distinct().persist()
    val nCorpus = math.max(corpusH.count(), 1L)
    val bloomBytes = corpusH
      .agg(call_function("graft_bloom_agg", col("h"), lit(nCorpus), lit(fpp)))
      .head().getAs[Array[Byte]](0)
    // Stream side: the same decode kernel, then probe + two-leg union.
    val hashed = Multimodal.wavFingerprint(ids)
      .toDF().select(col("media_id"), col("full_hash").as("h"))
    val probe =
      call_function("graft_bloom_contains", col("h"), lit(bloomBytes))
    val misses = hashed.filter(!probe)
      .select(col("media_id"),
        lit(false).as("bloom_hit"), lit(false).as("known"))
    val hits = hashed.filter(probe)
      .join(corpusH.withColumn("in_corpus", lit(true)), Seq("h"), "left")
      .select(col("media_id"), lit(true).as("bloom_hit"),
        coalesce(col("in_corpus"), lit(false)).as("known"))
    misses.unionByName(hits)
  }
}
