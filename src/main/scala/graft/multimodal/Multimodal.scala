package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: media payloads as opaque `binary` columns
  * with typed metadata, partition-wise batch decode / feature-extract /
  * frame-sample plumbing.
  *
  * The decode kernel itself is a clearly marked STUB (this container has no
  * image/audio codecs): [[FakeDecoder]] derives deterministic pseudo
  * dimensions/features from the payload bytes. Everything around it — the
  * schema, the typed Dataset surface, the mapPartitions batch shape, and
  * the pure-Column metadata operators — is the real Spark plumbing a
  * production decoder (JNI codec or Python worker via Arrow batches) would
  * plug into, partition-by-partition.
  */
object Multimodal {

  /** Canonical media-table schema: payload + typed metadata. */
  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("path", StringType),
    StructField("media_type", StringType), // image | audio | video
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("size_bytes", LongType),
      StructField("duration_ms", LongType))))))

  final case class MediaMeta(format: String, size_bytes: Long, duration_ms: Long)
  final case class MediaFile(
      media_id: Long, path: String, media_type: String,
      content: Array[Byte], meta: MediaMeta)
  final case class Decoded(
      media_id: Long, width: Int, height: Int, n_frames: Int,
      features: Array[Float])

  /** Decode kernel signature a real codec implements. */
  type Decoder = MediaFile => Decoded

  /** STUB decoder — deterministic fake standing in for a real codec.
    * Dimensions/features are pure functions of the payload bytes so tests
    * and both engines of a differential check agree.
    */
  val FakeDecoder: Decoder = { f =>
    val h = f.content.foldLeft(1125899906842597L)((acc, b) => acc * 31 + (b & 0xff))
    val w = 64 + math.floorMod(h, 1024).toInt
    val ht = 64 + math.floorMod(h >> 10, 1024).toInt
    val frames = if (f.media_type == "video") 1 + math.floorMod(h >> 20, 240).toInt else 1
    val feat = Array.tabulate(8)(i => math.floorMod(h >> (i * 7), 997).toFloat / 997f)
    Decoded(f.media_id, w, ht, frames, feat)
  }

  /** Partition-wise batch decode: the hot path stays an iterator pipeline
    * (one decoder instance per partition, no per-row setup), which is the
    * shape a JNI/Arrow-batch decoder needs at 100 TB.
    */
  def decodePartitions(
      media: Dataset[MediaFile],
      decoder: Decoder = FakeDecoder): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // Real impl: initialize the codec once here, then stream the batch.
      it.map(decoder)
    }
  }

  /** Metadata-only operators are pure Column expressions — no decode needed,
    * so Catalyst prunes `content` out of the scan entirely.
    */
  def mediaStats(media: DataFrame): DataFrame =
    media.groupBy("media_type").agg(
      count(lit(1)).as("n"),
      sum(col("meta.size_bytes")).as("total_bytes"),
      avg(col("meta.duration_ms")).as("avg_duration_ms"))

  /** Frame sampling plan: every `stride`-th frame index per video, as a
    * generated column (explode of a sequence) — row expansion happens in
    * Spark, only sampled frames would reach the decoder.
    */
  def sampleFrameIndexes(decoded: DataFrame, stride: Int = 30): DataFrame =
    decoded
      .filter(col("n_frames") > 1)
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .as("frame_index"))

  /** Resize spec: target dims preserving aspect ratio — pure arithmetic on
    * decoded metadata (the actual pixel resample belongs in the decoder).
    */
  def resizePlan(decoded: DataFrame, maxSide: Int = 256): DataFrame = {
    val scale = least(
      lit(maxSide) / col("width").cast(DoubleType),
      lit(maxSide) / col("height").cast(DoubleType),
      lit(1.0))
    decoded.select(col("media_id"), col("width"), col("height"),
      floor(col("width") * scale).cast(IntegerType).as("target_width"),
      floor(col("height") * scale).cast(IntegerType).as("target_height"))
  }

  /** Embedding-style feature distance on decoded features (cosine), for
    * dedup of near-identical media — same fold pattern as TdpQueries.
    */
  def featureCosine(decoded: DataFrame): DataFrame = {
    val a = decoded.select(col("media_id").as("id_a"), col("features").as("fa"))
    val b = decoded.select(col("media_id").as("id_b"), col("features").as("fb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("dot", expr(
        "aggregate(zip_with(fa, fb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE))," +
          " CAST(0 AS DOUBLE), (acc, x) -> acc + x)"))
      .withColumn("na", expr(
        "sqrt(aggregate(transform(fa, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))," +
          " CAST(0 AS DOUBLE), (acc, x) -> acc + x))"))
      .withColumn("nb", expr(
        "sqrt(aggregate(transform(fb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))," +
          " CAST(0 AS DOUBLE), (acc, x) -> acc + x))"))
      .select(col("id_a"), col("id_b"),
        (col("dot") / (col("na") * col("nb"))).as("cosine"))
  }
}
