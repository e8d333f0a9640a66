package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engines.IraRollover

class StreamingSpec extends SparkSpec {
  import EventsStream._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowedCounts: tumbling window aggregation with watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = windowedCounts(df, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("update").start()
    try {
      mem.addData(
        (1L, ts("2026-01-01 10:05:00"), 1L, "click", 2.0, "{}"),
        (2L, ts("2026-01-01 10:45:00"), 2L, "click", 3.0, "{}"),
        (3L, ts("2026-01-01 11:05:00"), 1L, "view", 1.0, "{}"))
      q.processAllAvailable()
      val rows = s.sql(
        "SELECT event_type, n_events, sum_value FROM win_counts ORDER BY event_type")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      assert(rows.toSeq == Seq(("click", 2L, 5.0), ("view", 1L, 1.0)))
    } finally q.stop()
  }

  test("sessionCounts: built-in session windows merge events within gap") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = sessionCounts(df, "30 minutes", "2 hours")
      .writeStream.format("memory").queryName("sess_counts")
      .outputMode("complete").start()
    try {
      mem.addData(
        (1L, ts("2026-01-01 10:00:00"), 1L, "click", 1.0, "{}"),
        (2L, ts("2026-01-01 10:10:00"), 1L, "click", 1.0, "{}"),
        // > 30 min gap -> second session for user 1
        (3L, ts("2026-01-01 11:30:00"), 1L, "click", 1.0, "{}"),
        (4L, ts("2026-01-01 10:00:00"), 2L, "view", 1.0, "{}"))
      q.processAllAvailable()
      val rows = s.sql(
        "SELECT user_id, n_events FROM sess_counts ORDER BY user_id, session_start")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSeq == Seq((1L, 2L), (1L, 1L), (2L, 1L)))
    } finally q.stop()
  }

  test("sessionize: flatMapGroupsWithState emits closed sessions") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val mem = MemoryStream[Event]
    val q = sessionize(mem.toDS(), gapSec = 1800L)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      mem.addData(
        Event(1L, ts("2026-01-01 10:00:00"), "click"),
        Event(1L, ts("2026-01-01 10:10:00"), "click"))
      q.processAllAvailable()
      // A later event for the same user closes the first session inline.
      mem.addData(Event(1L, ts("2026-01-01 12:00:00"), "click"))
      q.processAllAvailable()
      val rows = s.sql(
        "SELECT user_id, n_events FROM sessions ORDER BY start_sec")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSeq == Seq((1L, 2L)))
    } finally q.stop()
  }

  test("sessionize: out-of-order events extend the session backwards, not forwards") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val mem = MemoryStream[Event]
    val q = sessionize(mem.toDS(), gapSec = 1800L)
      .writeStream.format("memory").queryName("sessions_ooo")
      .outputMode("append").start()
    try {
      mem.addData(Event(1L, ts("2026-01-01 10:30:00"), "click"))
      q.processAllAvailable()
      // Late-but-within-watermark event 20 min BEFORE the open session:
      // must move start_sec back, not misreport it.
      mem.addData(Event(1L, ts("2026-01-01 10:10:00"), "click"))
      q.processAllAvailable()
      // An event far in the future closes the session.
      mem.addData(Event(1L, ts("2026-01-01 13:00:00"), "click"))
      q.processAllAvailable()
      val rows = s.sql(
        "SELECT user_id, start_sec, end_sec, n_events FROM sessions_ooo")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val startSec = ts("2026-01-01 10:10:00").getTime / 1000L
      val endSec = ts("2026-01-01 10:30:00").getTime / 1000L
      assert(rows.toSeq == Seq((1L, startSec, endSec, 2L)))
    } finally q.stop()
  }

  test("sessionize: consecutive late events merge into one earlier session") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val mem = MemoryStream[Event]
    val q = sessionize(mem.toDS(), gapSec = 1800L)
      .writeStream.format("memory").queryName("sessions_late_pair")
      .outputMode("append").start()
    try {
      mem.addData(Event(1L, ts("2026-01-01 12:00:00"), "click"))
      q.processAllAvailable()
      // Two late-but-in-watermark events 10 min apart, both > gap (30 min)
      // before the open session: they form ONE earlier session, not two
      // singletons (watermark is 1 h, so 11:05/11:15 still pass ingest).
      mem.addData(
        Event(1L, ts("2026-01-01 11:05:00"), "click"),
        Event(1L, ts("2026-01-01 11:15:00"), "click"))
      q.processAllAvailable()
      val rows = s.sql(
        "SELECT user_id, start_sec, end_sec, n_events FROM sessions_late_pair")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val st = ts("2026-01-01 11:05:00").getTime / 1000L
      val en = ts("2026-01-01 11:15:00").getTime / 1000L
      assert(rows.toSeq == Seq((1L, st, en, 2L)))
    } finally q.stop()
  }

  test("dedupEvents drops in-watermark duplicates across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = dedupEvents(df, "2 hours")
      .writeStream.format("memory").queryName("dedup_events")
      .outputMode("append").start()
    try {
      // Same event id delivered twice in one batch and again in the next
      // (at-least-once redelivery): must survive exactly once.
      mem.addData(
        (1L, ts("2026-01-01 10:00:00"), 1L, "click", 1.0, "{}"),
        (1L, ts("2026-01-01 10:00:00"), 1L, "click", 1.0, "{}"),
        (2L, ts("2026-01-01 10:01:00"), 1L, "view", 2.0, "{}"))
      q.processAllAvailable()
      mem.addData(
        (1L, ts("2026-01-01 10:00:00"), 1L, "click", 1.0, "{}"),
        (3L, ts("2026-01-01 10:02:00"), 2L, "click", 3.0, "{}"))
      q.processAllAvailable()
      val rows = s.sql("SELECT event_id FROM dedup_events ORDER BY event_id")
        .collect().map(_.getLong(0))
      assert(rows.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("readEvents streams the driver's nano-timestamp events feed") {
    val s = spark
    // File streams require a directory; stage the feed file into one.
    val dir = java.nio.file.Files.createTempDirectory("graft-events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    val q = windowedCounts(
      readEvents(s, dir.toString), "1 hour", "2 hours")
      .writeStream.format("memory").queryName("file_win")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      val n = s.sql("SELECT sum(n_events) FROM file_win").head.getLong(0)
      // All events from the feed are windowed (none dropped on ingest).
      val total = s.read.parquet("/root/testdata/sf0.001/events.parquet").count()
      assert(n == total)
    } finally q.stop()
  }

  test("Engine B runs on a streaming fact with a static broadcast dimension") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    // Static demographics dimension (the stream-static join pattern: the
    // dimension is broadcast once, the streaming fact never shuffles).
    val demo = Seq(
      ("200100", "123456780", "1960-01-15", "2020-06-30", "A", "B"),
      ("200100", "123456781", "2000-05-20", null, "C", "D"))
      .toDF("plan_id", "ssn", "dob", "term_date", "first_name", "last_name")

    val mem = MemoryStream[(String, String, String, String, String, Double)]
    val matrix = mem.toDF().toDF("plan_id", "ssn", "txn_date",
      "tax_code_1", "tax_code_2", "gross_amt")
      .withColumn("txn_date", to_date(col("txn_date")))
    val q = graft.engines.AgeTaxCode.run(matrix, demo)
      .select("ssn", "match_status", "expected_tax_code_1")
      .writeStream.format("memory").queryName("eb_stream")
      .outputMode("append").start()
    try {
      mem.addData(
        // age 65 at txn year -> normal distribution expects code 7
        ("200100", "123456780", "2025-03-01", "1", null.asInstanceOf[String], 100.0),
        // age 24, no term date -> expects 1 (matches) -> no action
        ("200100", "123456781", "2025-03-01", "1", null.asInstanceOf[String], 50.0))
      q.processAllAvailable()
      val rows = s.sql(
        "SELECT ssn, match_status, expected_tax_code_1 FROM eb_stream ORDER BY ssn")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      assert(rows.toSeq == Seq(
        ("123456780", "match_needs_correction", "7"),
        ("123456781", "match_no_action", "1")))
    } finally q.stop()
  }

  test("Engine D runs unchanged on a streaming DataFrame") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val mem = MemoryStream[(String, String, String, String, String, String,
      String, String, String, String)]
    val df = mem.toDF().toDF("plan_id", "txn_method", "federal_taxing_method",
      "tax_form", "transaction_id", "txn_date", "ssn", "matrix_account",
      "participant_name", "tax_code_1")
      .withColumn("txn_date", to_date(col("txn_date")))
      .withColumn("tax_code_2", lit(null).cast("string"))
    val q = IraRollover.run(df)
      .select("transaction_id", "match_status", "new_tax_code")
      .writeStream.format("memory").queryName("ed_stream")
      .outputMode("append").start()
    try {
      mem.addData(
        ("300001IRA", "Check Distribution", "Rollover", "1099-R", "T1",
          "2025-03-01", "123456780", "MA01", "A B", "G"),
        ("300001IRA", "Check Distribution", "Rollover", "No Tax", "T2",
          "2025-03-01", "123456781", "MA01", "C D", "G"),
        ("200100", "Check Distribution", "Rollover", "1099-R", "T3",
          "2025-03-01", "123456782", "MA01", "E F", "G"))
      q.processAllAvailable()
      val rows = s.sql(
        "SELECT transaction_id, match_status, new_tax_code FROM ed_stream ORDER BY 1")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      assert(rows.toSeq == Seq(
        ("T1", "match_needs_correction", "0"),
        ("T2", "match_no_action", null)))
    } finally q.stop()
  }

  test("attributeClicks: stream-stream interval join within the horizon") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = attributeClicks(df, "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      mem.addData(
        // view v1 at 10:00 -> click c1 at 10:05 joins (5 min <= horizon);
        // click c2 at 10:30 is 30 min after the view -> no match;
        // user 2 clicks with no view -> no match. Inner stream-stream
        // joins emit matches as soon as both sides arrive — no watermark
        // advancement needed for emission (it only bounds buffered state).
        (1L, ts("2026-01-01 10:00:00"), 1L, "view", 1.0, "{}"),
        (2L, ts("2026-01-01 10:05:00"), 1L, "click", 1.0, "{}"),
        (3L, ts("2026-01-01 10:30:00"), 1L, "click", 1.0, "{}"),
        (4L, ts("2026-01-01 10:02:00"), 2L, "click", 1.0, "{}"))
      q.processAllAvailable()
      val rows = s.sql("SELECT user_id, click_id, view_id FROM attrib")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rows.toSeq == Seq((1L, 2L, 1L)))
    } finally q.stop()
  }

  test("dedupByContent keeps the first payload occurrence within the watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = dedupByContent(df, "2 hours")
      .writeStream.format("memory").queryName("content_dedup")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, ts("2026-01-01 10:00:00"), 1L, "click", 1.0, """{"p":1}"""),
        (2L, ts("2026-01-01 10:01:00"), 2L, "click", 1.0, """{"p":1}"""))
      q.processAllAvailable()
      // second batch: same payload redelivered -> dropped (in-watermark);
      // two DISTINCT null-payload events -> both survive (a content-less
      // event carries no duplicate evidence; see dedupByContent's keying)
      mem.addData(
        (3L, ts("2026-01-01 10:02:00"), 3L, "click", 1.0, """{"p":1}"""),
        (4L, ts("2026-01-01 10:03:00"), 4L, "click", 1.0, """{"p":2}"""),
        (5L, ts("2026-01-01 10:04:00"), 5L, "click", 1.0, null),
        (6L, ts("2026-01-01 10:05:00"), 6L, "click", 1.0, null))
      q.processAllAvailable()
      val ids = s.sql("SELECT event_id FROM content_dedup ORDER BY 1")
        .collect().map(_.getLong(0))
      assert(ids.toSeq == Seq(1L, 4L, 5L, 6L))
    } finally q.stop()
  }

  test("streaming near-dup: clone flagged cross-batch and in-batch, novel doc clean") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val b = "one two three four five six seven eight nine"
    val mem = MemoryStream[(Long, Timestamp, String)]
    val df = mem.toDF().toDF("doc_id", "ts", "text")
    val q = DocsStream.nearDupBands(df)
      .writeStream.format("memory").queryName("near_dup_bands")
      .outputMode("append").start()
    try {
      // batch 1: doc 1 opens its buckets; doc 10 is an in-batch clone of
      // 1 (doc_id order decides the keeper); doc 2 is novel.
      mem.addData(
        (1L, ts("2026-01-01 10:00:00"), a),
        (10L, ts("2026-01-01 10:00:30"), a),
        (2L, ts("2026-01-01 10:01:00"), b))
      q.processAllAvailable()
      // batch 2: doc 20 is a cross-batch clone of 1.
      mem.addData((20L, ts("2026-01-01 10:05:00"), a))
      q.processAllAvailable()
      val verdicts = s.sql(
        """SELECT doc_id,
          |  min(CASE WHEN earlier_doc >= 0 THEN earlier_doc END) AS evidence
          |FROM near_dup_bands GROUP BY 1 ORDER BY 1""".stripMargin)
        .collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      assert(verdicts(1L) === -1L, "first doc opens every bucket")
      assert(verdicts(2L) === -1L, "novel doc matches nothing")
      assert(verdicts(10L) === 1L, "in-batch clone resolves to the min id")
      assert(verdicts(20L) === 1L, "cross-batch clone finds the bucket owner")
      // every doc produced all 4 band verdicts (exact clones share all bands)
      val nBands = s.sql(
        "SELECT doc_id, count(*) FROM near_dup_bands GROUP BY 1")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(nBands.values.forall(_ === 4L), s"4 band rows per doc: $nBands")
    } finally q.stop()
  }

  test("streaming bloom prefilter: novel docs bypass the verify join across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "pack my box with five dozen liquor jugs"))
      .toDF("doc_id", "text")
    val mem = MemoryStream[(Long, Timestamp, String)]
    val df = mem.toDF().toDF("doc_id", "ts", "text")
    val out = DocsStream.bloomNovelty(df, corpus)

    // The miss-skip must be STRUCTURAL: the plan is a union whose
    // bloom-miss leg contains NO join (novel docs never reach the verify
    // join), while the probe-hit leg carries the stream-static semi
    // verification. Assert on the analyzed logical plan of the stream.
    import org.apache.spark.sql.catalyst.plans.logical.{Join, Union}
    val union = out.queryExecution.analyzed.collectFirst {
      case u: Union => u
    }.getOrElse(fail("bloomNovelty must plan as a two-leg union"))
    val Seq(missLeg, hitLeg) = union.children.toSeq
    assert(missLeg.collect { case j: Join => j }.isEmpty,
      s"bloom-miss leg must be join-free:\n$missLeg")
    assert(missLeg.toString.contains("graft_bloom_contains"))
    assert(hitLeg.collect { case j: Join => j }.nonEmpty,
      s"probe-hit leg must carry the verify join:\n$hitLeg")

    val q = out
      .writeStream.format("memory").queryName("bloom_novelty")
      .outputMode("append").start()
    try {
      // batch 1: doc 1 is a corpus duplicate, doc 2 is novel.
      mem.addData(
        (1L, ts("2026-01-01 10:00:00"),
          "the quick brown fox jumps over the lazy dog"),
        (2L, ts("2026-01-01 10:01:00"), "a wholly novel document"))
      q.processAllAvailable()
      // batch 2: the sketch keeps serving later batches — doc 3 dups the
      // OTHER corpus doc, doc 4 is novel.
      mem.addData(
        (3L, ts("2026-01-01 10:05:00"),
          "pack my box with five dozen liquor jugs"),
        (4L, ts("2026-01-01 10:06:00"), "another never seen text"))
      q.processAllAvailable()
      val rows = s.sql(
        "SELECT doc_id, bloom_hit, known FROM bloom_novelty ORDER BY 1")
        .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2))))
        .toMap
      assert(rows(1L) === ((true, true)), "corpus dup: probe hit + verified")
      assert(rows(3L) === ((true, true)), "cross-batch corpus dup verified")
      // Novel docs: definitively novel on the bloom miss (no false
      // negatives); with 2 corpus keys at fpp=0.01 a false positive on
      // these fixed hashes would be deterministic and caught here.
      assert(rows(2L) === ((false, false)), "novel doc skips the join")
      assert(rows(4L) === ((false, false)), "novel doc skips the join")
    } finally q.stop()
  }
}
