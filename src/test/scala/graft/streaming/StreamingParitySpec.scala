package graft.streaming

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.queries.Registry

/** Batch-equivalence harness for the streaming surface: every
  * DocsStream/EventsStream entry point runs as a real file-source stream
  * over the SAME driver-generated parquet the batch queries read, and
  * its complete output is compared SET-wise against an independently
  * computed batch twin. This is the oracle discipline of the batch-query
  * registry extended to the streaming operators, which the DuckDB gate
  * cannot reach (micro-batch boundaries and watermarks are not
  * SQL-expressible): same inputs, two execution models, equal results.
  */
class StreamingParitySpec extends SparkSpec {
  import EventsStream._

  private val sf = "/root/testdata/sf0.001"

  /** Stage the events feed into a fresh dir (file streams read dirs). */
  private def stageEvents(copies: Int = 1): String = {
    val dir = Files.createTempDirectory("graft-parity-events")
    (1 to copies).foreach { i =>
      Files.copy(Paths.get(s"$sf/events.parquet"),
        dir.resolve(s"events_$i.parquet"))
    }
    dir.toString
  }

  /** Batch read with readEvents' type-adaptive ts conversion — the twin
    * must normalize event time exactly the way the stream does.
    */
  private def batchEvents(s: SparkSession, dir: String): DataFrame = {
    val df = s.read.parquet(dir)
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType => df
      case _ => df.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  private def runToMemory(
      df: DataFrame, name: String, mode: String)(body: => Unit): Unit = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    try { q.processAllAvailable(); body } finally q.stop()
  }

  test("windowedCounts parity: stream complete output == batch groupBy") {
    val s = spark
    val dir = stageEvents()
    runToMemory(windowedCounts(readEvents(s, dir)), "par_win", "complete") {
      val got = s.sql("SELECT * FROM par_win").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime,
          r.getString(2)) -> (r.getLong(3), r.getDouble(4))).toMap
      val want = batchEvents(s, dir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum("value").as("sv"))
        .collect()
        .map(r => (r.getStruct(0).getTimestamp(0).getTime,
          r.getStruct(0).getTimestamp(1).getTime,
          r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
      assert(got.keySet == want.keySet)
      got.foreach { case (k, (n, sv)) =>
        assert(n == want(k)._1, s"count mismatch at $k")
        // Double sums may fold in a different order across the models.
        assert(math.abs(sv - want(k)._2) < 1e-6, s"sum mismatch at $k")
      }
    }
  }

  test("sessionCounts parity: stream session windows == batch session windows") {
    val s = spark
    val dir = stageEvents()
    runToMemory(sessionCounts(readEvents(s, dir)), "par_sess", "complete") {
      val got = s.sql("SELECT * FROM par_sess").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime,
          r.getLong(2), r.getLong(3))).toSet
      val want = batchEvents(s, dir)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getStruct(0).getTimestamp(0).getTime,
          r.getStruct(0).getTimestamp(1).getTime,
          r.getLong(1), r.getLong(2))).toSet
      assert(got == want)
    }
  }

  test("dedupEvents parity: duplicated feed collapses to the batch distinct set") {
    val s = spark
    // The whole feed staged TWICE lands in one micro-batch: every
    // event_id arrives at least twice and must survive exactly once.
    val dir = stageEvents(copies = 2)
    runToMemory(dedupEvents(readEvents(s, dir)), "par_dedup", "append") {
      val ids = s.sql("SELECT event_id FROM par_dedup").collect()
        .map(_.getLong(0))
      val want = batchEvents(s, dir).select("event_id").distinct()
        .collect().map(_.getLong(0)).toSet
      assert(ids.length == want.size, "each id must survive exactly once")
      assert(ids.toSet == want)
    }
  }

  test("dedupByContent parity: one survivor per batch content hash") {
    val s = spark
    val dir = stageEvents(copies = 2)
    runToMemory(dedupByContent(readEvents(s, dir)), "par_cdedup", "append") {
      val rows = s.sql("SELECT content_hash FROM par_cdedup").collect()
        .map(_.getString(0))
      val want = batchEvents(s, dir)
        .select(coalesce(md5(col("props").cast(BinaryType)),
          concat(lit("null-payload:"), col("event_id"))).as("h"))
        .distinct().collect().map(_.getString(0)).toSet
      assert(rows.length == want.size)
      assert(rows.toSet == want)
    }
  }

  test("enrichEvents parity: stream-static broadcast join == batch left join") {
    val s = spark
    val dir = stageEvents()
    // Static per-user profile built ONCE from the batch feed: the
    // dimension a serving layer would precompute.
    val userDim = batchEvents(s, dir).groupBy("user_id")
      .agg(count(lit(1)).as("hist_events"), sum("value").as("hist_value"))
    runToMemory(
      enrichEvents(readEvents(s, dir), userDim)
        .select("event_id", "user_id", "hist_events"), "par_enrich",
      "append") {
      val got = s.sql("SELECT * FROM par_enrich").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val want = batchEvents(s, dir)
        .join(broadcast(userDim), Seq("user_id"), "left")
        .select("event_id", "user_id", "hist_events").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got.size == want.size && got == want,
        s"stream-static enrichment diverged: ${got.size} vs ${want.size}")
      // Every event found its profile (the dim covers every user here).
      assert(got.values.forall(_._2 >= 1L))
    }
  }

  test("attributeClicks parity: stream-stream interval join == batch theta join") {
    val s = spark
    val dir = stageEvents()
    runToMemory(attributeClicks(readEvents(s, dir)), "par_attr", "append") {
      val got = s.sql("SELECT click_id, view_id FROM par_attr").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val e = batchEvents(s, dir)
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
          col("ts").as("view_ts"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
          col("ts").as("click_ts"))
      val want = clicks.join(views,
        col("c_user") === col("v_user") &&
          col("view_ts") <= col("click_ts") &&
          col("view_ts") >= col("click_ts") - expr("INTERVAL 10 minutes"))
        .select("click_id", "view_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.nonEmpty && got == want)
    }
  }

  test("sessionize parity: closed sessions == q12_sessionize on the same feed") {
    val s = spark
    import s.implicits._
    val dir = stageEvents()
    // A far-future sentinel (user -1) appended as a second file pushes
    // the watermark past every real session so ALL of them close and
    // emit — full set equality, not a subset check.
    val events = readEvents(s, dir)
      .select(col("user_id"), col("ts"), col("event_type")).as[Event]
    val q = sessionize(events)
      .writeStream.format("memory").queryName("par_sz")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val base = s.read.parquet(dir)
      val maxTs = base.agg(max("ts")).head.get(0)
      val sentinel = base.limit(1)
        .withColumn("event_id", lit(99999999L))
        .withColumn("user_id", lit(-1L))
        .withColumn("ts", base.schema("ts").dataType match {
          case LongType =>
            lit(maxTs.asInstanceOf[Long] + 864000L * 1000000000L)
          case _ =>
            val ms = maxTs match {
              case t: Timestamp => t.getTime
              case l: java.time.LocalDateTime =>
                Timestamp.valueOf(l).getTime
              case i: java.time.Instant => i.toEpochMilli
            }
            lit(new Timestamp(ms + 864000L * 1000L))
        })
      sentinel.write.mode("append").parquet(dir)
      q.processAllAvailable()
      q.processAllAvailable() // no-data batch fires the event-time timeouts
      val got = s.sql(
        "SELECT user_id, start_sec, end_sec, n_events FROM par_sz WHERE user_id >= 0")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      val want = Registry.queries("q12_sessionize")(s, sf)
        .select("user_id", "start_sec", "end_sec", "n_events")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(got == want,
        s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    } finally q.stop()
  }

  test("scd2 parity: versions and intervals == tdp_scd2_history on the feed") {
    val s = spark
    import s.implicits._
    val dir = stageEvents()
    val events = readEvents(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[ScdEvent]
    val q = scd2(events)
      .writeStream.format("memory").queryName("par_scd")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // Far-future sentinel (user -1) closes the books: the watermark
      // passes every open version's horizon so is_current rows emit.
      val base = s.read.parquet(dir)
      val maxTs = base.agg(max("ts")).head.get(0)
      val sentinel = base.limit(1)
        .withColumn("event_id", lit(99999999L))
        .withColumn("user_id", lit(-1L))
        .withColumn("ts", base.schema("ts").dataType match {
          case LongType =>
            lit(maxTs.asInstanceOf[Long] + 864000L * 1000000000L)
          case _ =>
            val ms = maxTs match {
              case t: Timestamp => t.getTime
              case l: java.time.LocalDateTime =>
                Timestamp.valueOf(l).getTime
              case i: java.time.Instant => i.toEpochMilli
            }
            lit(new Timestamp(ms + 864000L * 1000L))
        })
      sentinel.write.mode("append").parquet(dir)
      q.processAllAvailable()
      q.processAllAvailable() // no-data batch fires the event-time timeouts
      val got = s.sql("SELECT user_id, version, event_type, valid_from, " +
          "valid_to, is_current FROM par_scd WHERE user_id >= 0")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
          r.getLong(3), r.getLong(4), r.getBoolean(5))).toSet
      val want = Registry.queries("tdp_scd2_history")(s, sf)
        .collect().map(r => (r.getAs[Long]("user_id"),
          r.getAs[Int]("version"), r.getAs[String]("event_type"),
          r.getAs[Long]("valid_from"), r.getAs[Long]("valid_to"),
          r.getAs[Boolean]("is_current"))).toSet
      assert(got == want,
        s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    } finally q.stop()
  }

  test("audioNovelty parity: streamed decode+bloom verdicts == batch membership") {
    val s = spark
    import s.implicits._
    // Corpus: clips 0..59 (residues 0..59 of the 96-period synthesis).
    // Stream: 230..279 (residues 38..87): ids 230..251 are byte-identical
    // clones of corpus clips and must verdict known=true; 252..279 carry
    // residues no corpus clip has — genuinely novel.
    val streamDir = Files.createTempDirectory("graft-parity-media").toString
    (230L until 280L).toDF("media_id")
      .write.mode("overwrite").parquet(streamDir)
    val corpusIds = s.range(0, 60).as[Long]
    val ids = s.readStream
      .schema(StructType(Seq(StructField("media_id", LongType))))
      .parquet(streamDir)
      .select(col("media_id")).as[Long]
    val out = MediaStream.audioNovelty(ids, corpusIds)
    val q = out.writeStream.format("memory").queryName("par_media")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = s.sql("SELECT media_id, known FROM par_media")
        .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
      assert(got.size == 50)
      // Batch twin: exact membership of the full PCM fold.
      val corpusH = graft.multimodal.Multimodal
        .wavFingerprint(corpusIds).collect().map(_.full_hash).toSet
      val want = graft.multimodal.Multimodal
        .wavFingerprint(s.range(230, 280).as[Long]).collect()
        .map(p => p.media_id -> corpusH.contains(p.full_hash)).toMap
      assert(got == want,
        s"diff=${(want.toSet -- got.toSet).take(5)}")
      // The clone construction is non-vacuous in both directions.
      assert(got.values.exists(identity) && got.values.exists(!_))
    } finally q.stop()
  }

  /** The documents feed with a deterministic event-time column. */
  private def stageDocs(s: SparkSession): String = {
    val dir = Files.createTempDirectory("graft-parity-docs").toString
    s.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        timestamp_seconds(lit(1700000000L) + col("doc_id")).as("ts"),
        col("text"))
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("lengthSketch parity: streamed bucket state == batch histogram") {
    val s = spark
    import graft.queries.TdpQueries.toksExpr
    // Stage WITH source (stageDocs drops it) and split into two files so
    // the state provably merges across micro-batches, not just within one.
    val dir = Files.createTempDirectory("graft-parity-lens").toString
    val base = s.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    base.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/f1.parquet")
    base.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/f2.parquet")
    val stream = s.readStream
      .schema(StructType(Seq(
        StructField("doc_id", LongType), StructField("source", StringType),
        StructField("text", StringType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/*")
    runToMemory(DocsStream.lengthSketch(stream).toDF(), "par_lens",
      "update") {
      // counts are monotone per (source, bucket): the LAST emit is the
      // MAX — compare it against the batch histogram on the same feed.
      val got = s.sql(
        "SELECT source, i, max(n) FROM par_lens GROUP BY 1, 2").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val want = base
        .withColumn("x", size(expr(toksExpr)).cast("long"))
        .withColumn("i",
          expr("""CASE WHEN x < 16 THEN x ELSE
                 |  (length(bin(x)) - 1 - 4) * 16
                 |    + shiftright(x, CAST(length(bin(x)) - 1 - 4 AS INT))
                 |END""".stripMargin))
        .groupBy("source", "i").count().collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == want,
        s"stream/batch bucket mismatch: ${(got.toSet diff want.toSet).take(5)}")
    }
  }

  test("nearDupBands parity: stream verdicts == batch bucket-min construction") {
    val s = spark
    graft.expressions.GraftExtensions.registerAll(s)
    import graft.queries.TdpQueries.{polyHashExpr, shinglesExpr, toksExpr, MhA, MhB, P}
    val dir = stageDocs(s)
    val stream = s.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("ts", TimestampType), StructField("text", StringType))))
      .parquet(dir)
    val q = DocsStream.nearDupBands(stream)
      .writeStream.format("memory").queryName("par_bands")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = s.sql("SELECT doc_id, band, earlier_doc FROM par_bands")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      // Batch twin: identical signature construction; within one batch
      // the verdict is min-doc-of-bucket (-1 for the opener itself).
      val sigs = MhA.zip(MhB).zipWithIndex.map { case ((a, b), j) =>
        expr(s"array_min(transform(hashes, h -> (h * $a + $b) % $P))").as(s"mh$j")
      }
      val sigDf = s.read.parquet(dir)
        .withColumn("toks", expr(toksExpr))
        .withColumn("shingles", expr(shinglesExpr))
        .withColumn("hashes",
          expr(s"transform(shingles, sh -> ${polyHashExpr("sh")})"))
        .filter(size(col("shingles")) > 0)
        .select(col("doc_id") +: sigs: _*)
      val bandStructs = (0 until 4).map { band =>
        struct(lit(band).as("band"),
          concat_ws(":", col(s"mh${2 * band}"), col(s"mh${2 * band + 1}"))
            .as("sig"))
      }
      val bands = sigDf
        .select(col("doc_id"), explode(array(bandStructs: _*)).as("bs"))
        .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
      val mins = bands.groupBy("band", "sig").agg(min("doc_id").as("m"))
      val want = bands.join(mins, Seq("band", "sig"))
        .select(col("doc_id"), col("band"),
          when(col("doc_id") === col("m"), lit(-1L)).otherwise(col("m"))
            .as("earlier_doc"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(got == want,
        s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    } finally q.stop()
  }

  test("bloomNovelty parity: stream verdicts carry the exact batch membership") {
    val s = spark
    val dir = stageDocs(s)
    val corpus = s.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 10 =!= 7).select("text")
    val stream = s.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("ts", TimestampType), StructField("text", StringType))))
      .parquet(dir)
    val q = DocsStream.bloomNovelty(stream, corpus)
      .writeStream.format("memory").queryName("par_bloom")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = s.sql("SELECT doc_id, bloom_hit, known FROM par_bloom")
        .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
      val corpusH = corpus.select(xxhash64(col("text")).as("h"))
        .collect().map(_.getLong(0)).toSet
      val want = s.read.parquet(dir)
        .select(col("doc_id"), xxhash64(col("text")).as("h"))
        .collect().map(r => r.getLong(0) -> corpusH.contains(r.getLong(1)))
        .toMap
      assert(got.map(_._1).toSet == want.keySet)
      got.foreach { case (id, hit, known) =>
        // `known` is EXACT membership — the Bloom sketch only routes.
        assert(known == want(id), s"doc $id known=$known truth=${want(id)}")
        // No false negatives: every known doc must have probed positive.
        assert(hit || !known, s"doc $id known but bloom-missed")
      }
      assert(got.exists(g => g._3) && got.exists(g => !g._3),
        "the %10 split must make both verdicts non-vacuous")
    } finally q.stop()
  }

  test("tokenSketch parity: streamed CMS state == batch fold, bit for bit") {
    val s = spark
    graft.expressions.GraftExtensions.registerAll(s)
    val dir = Files.createTempDirectory("graft-parity-cms").toString
    s.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        timestamp_seconds(lit(1700000000L) + col("doc_id")).as("ts"),
        col("text"))
      .repartition(4) // multiple files -> multiple micro-batches
      .write.mode("overwrite").parquet(dir)
    val nFiles = new java.io.File(dir)
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(nFiles > 1, "parity needs multiple micro-batches to merge state")
    val stream = s.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("ts", TimestampType), StructField("text", StringType))))
      .option("maxFilesPerTrigger", "1") // one file per micro-batch
      .parquet(dir)
    val q = DocsStream.tokenSketch(stream)
      .writeStream.format("memory").queryName("par_cms")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = s.sql("SELECT cms FROM par_cms")
        .collect().head.getAs[Array[Byte]](0)
      val batch = DocsStream.tokenSketch(s.read.parquet(dir))
        .collect().head.getAs[Array[Byte]](0)
      // Element-wise counter add is commutative/associative: however the
      // feed was micro-batched, the merged state IS the batch sketch.
      assert(java.util.Arrays.equals(streamed, batch),
        "streamed CMS state diverged from the batch fold")
      // And the live sketch answers frequency probes with the
      // no-undercount guarantee intact.
      val skLit = lit(streamed)
      val checked = s.read.parquet(dir)
        .select(explode(expr(graft.queries.TdpQueries.toksExpr)).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("truth"))
        .withColumn("est", call_function("graft_cms_estimate",
          expr(graft.queries.TdpQueries.polyHashExpr("tok")), skLit))
        .filter(col("est") < col("truth"))
        .count()
      assert(checked == 0L, "CMS must never under-count")
    } finally q.stop()
  }
}
