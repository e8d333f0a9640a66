package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the events feed — the streaming
  * extension of SURVEY §2.10: tumbling/session windowed aggregation with
  * watermarks, plus custom stateful sessionization via
  * flatMapGroupsWithState. The batch twin of the sessionizer is
  * CoreQueries q12_sessionize (oracle-checked); these operators share its
  * 30-minute-gap semantics.
  *
  * The stateless reconciliation engines (notably Engine D's filter +
  * classify, graft.engines.IraRollover) run unchanged on a streaming
  * DataFrame — see StreamingSpec.
  */
object EventsStream {

  /** Explicit schema — never infer on a stream. */
  val EventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** EventsSchema with `ts` swapped for the given on-disk type (streams
    * require an explicit schema; the driver's events.parquet has shipped
    * both TIMESTAMP(NANOS)-as-long and timestamp[us] encodings).
    */
  def eventsSchemaWithTs(tsType: DataType): StructType = StructType(
    EventsSchema.fields.map {
      case f if f.name == "ts" => f.copy(dataType = tsType)
      case f => f
    })

  /** File-source reader (parquet dir, append-only) over the driver's
    * events feed. The physical `ts` encoding is probed once from the
    * parquet footer (a driver-side metadata read, not a data scan) and the
    * stream schema derived from it, so regenerated testdata can flip
    * between nano-long and timestamp[us] without breaking ingest; either
    * way the output `ts` is a proper TimestampType event-time column so
    * watermarks work downstream.
    */
  def readEvents(spark: SparkSession, path: String): DataFrame = {
    // The probe needs at least one committed file; a stream may legally
    // start on an empty directory, where batch read throws "Unable to
    // infer schema". Fall back to the timestamp[us] default (the driver's
    // current encoding) so the stream still starts cleanly.
    val onDisk = scala.util.Try(spark.read.parquet(path).schema("ts").dataType)
      .getOrElse(TimestampType)
    val stream = spark.readStream.schema(eventsSchemaWithTs(onDisk)).parquet(path)
    onDisk match {
      case LongType => stream.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType => stream
      case _ => stream.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  /** Tumbling-window counts + sums per event type with a watermark bounding
    * state. At scale the shuffle key is (window, event_type) and late data
    * beyond the watermark is dropped, so state is O(windows x types).
    */
  def windowedCounts(
      events: DataFrame,
      windowLength: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Built-in session windows (gap-based), watermark-bounded. */
  def sessionCounts(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("user_id"),
        col("n_events"))

  /** Streaming exact dedup on event_id — the streaming twin of the batch
    * tdp_exact_dedup operator for an at-least-once ingest feed. State is
    * watermark-bounded: `dropDuplicatesWithinWatermark` ages dedup keys
    * out once the event-time watermark passes them, so state is
    * O(events inside the watermark horizon), never unbounded — the
    * property that makes this safe on an infinite 100 TB/day feed.
    */
  def dedupEvents(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-STATIC enrichment: attach a static per-user dimension to the
    * event stream by broadcast hash join — the zero-state enrichment
    * shape (no watermark, no join state: the static side is fixed for
    * the query's lifetime and broadcast to every micro-batch's tasks).
    * LEFT join so unknown users flow through null-extended; at 100 TB
    * the dimension is the thing that must stay broadcast-sized, the
    * stream side never shuffles at all.
    */
  def enrichEvents(events: DataFrame, userDim: DataFrame): DataFrame =
    events.join(
      org.apache.spark.sql.functions.broadcast(userDim), Seq("user_id"),
      "left")

  /** Stream-stream interval join: attribute each click to the view(s) by
    * the same user within `horizon` BEFORE the click. Both sides carry
    * watermarks and the join predicate bounds event time on both ends —
    * exactly the conditions Spark needs to retire buffered join state as
    * the watermark advances, so state is O(events inside horizon), never
    * unbounded. Self-joining one source stream is supported; at scale the
    * join shuffles both sides on user_id only.
    */
  def attributeClicks(
      events: DataFrame,
      horizon: String = "10 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    clicks.join(views,
      col("c_user") === col("v_user") &&
        col("view_ts") <= col("click_ts") &&
        col("view_ts") >= col("click_ts") - expr(s"INTERVAL $horizon"))
      .select(col("c_user").as("user_id"), col("click_id"), col("view_id"),
        col("click_ts"), col("view_ts"))
  }

  /** Streaming content dedup: first occurrence of each payload hash inside
    * the watermark horizon wins — the streaming twin of the batch
    * tdp_exact_dedup operator (hash the content, never shuffle the body).
    * Same bounded-state guarantee as [[dedupEvents]].
    *
    * Null payloads get a per-event key (dropDuplicates treats equal NULL
    * keys as duplicates, which would silently swallow every null-payload
    * event after the first — a content-less event carries no evidence of
    * being a duplicate, so it must survive).
    */
  def dedupByContent(
      events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("content_hash",
        coalesce(md5(col("props").cast(BinaryType)),
          concat(lit("null-payload:"), col("event_id"))))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  final case class Event(user_id: Long, ts: Timestamp, event_type: String)
  final case class SessionState(startSec: Long, endSec: Long, n: Long)
  final case class SessionOut(
      user_id: Long, start_sec: Long, end_sec: Long, n_events: Long)

  /** Custom stateful sessionization (30-min default gap): one state entry
    * per active user, sessions emitted when the event-time watermark passes
    * the gap. Mirrors q12_sessionize's gaps-and-islands semantics but
    * incrementally, with bounded state.
    */
  def sessionize(
      events: Dataset[Event],
      gapSec: Long = 1800L): Dataset[SessionOut] = {
    import events.sparkSession.implicits._

    def update(
        userId: Long,
        rows: Iterator[Event],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(SessionOut(userId, s.startSec, s.endSec, s.n))
      } else {
        // Gaps-and-islands fold over the open session plus ALL the batch's
        // events in time order — the same construction as the q12 batch
        // twin, so in-batch out-of-order events (including several late
        // events that belong to a common EARLIER session) merge correctly
        // instead of each becoming a singleton. The latest island stays
        // open as state; earlier islands close immediately. Known
        // limitation of one-island state: a late event can only merge
        // with islands present in ITS batch — an earlier-island event
        // already emitted in a previous batch is not reopened.
        val intervals = (state.getOption.map(s => (s.startSec, s.endSec, s.n)).toList
          ++ rows.map(e => { val sec = e.ts.getTime / 1000L; (sec, sec, 1L) }))
          .sortBy(t => (t._1, t._2))
        val islandsDesc = intervals.foldLeft(List.empty[(Long, Long, Long)]) {
          case ((as, ae, an) :: tail, (bs, be, bn)) if bs - ae <= gapSec =>
            (as, math.max(ae, be), an + bn) :: tail
          case (acc, b) => b :: acc
        }
        islandsDesc match {
          case Nil => Iterator.empty
          case open :: closedDesc =>
            state.update(SessionState(open._1, open._2, open._3))
            state.setTimeoutTimestamp((open._2 + gapSec) * 1000L)
            closedDesc.reverseIterator
              .map(s => SessionOut(userId, s._1, s._2, s._3))
        }
      }
    }

    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }

  final case class ScdEvent(
      user_id: Long, ts: Timestamp, event_id: Long, event_type: String)
  final case class ScdState(
      curType: String, validFrom: Long, version: Int, lastSec: Long)
  final case class ScdOut(
      user_id: Long, version: Int, event_type: String,
      valid_from: Long, valid_to: Long, is_current: Boolean)

  /** Streaming SCD2 history build — the incremental twin of the batch
    * `tdp_scd2_history` query: per key, the currently OPEN version is the
    * only state; a batch's events fold in (sec, event_id) order, each
    * attribute change emits the closed version immediately, and the open
    * version emits as `is_current` (valid_to = -1) when the event-time
    * watermark passes `horizonSec` beyond its start — the same
    * close-the-books device as [[sessionize]]'s timeout. State is ONE
    * record per active key regardless of feed length (vs the batch
    * window's full-partition sort), which is what makes the history build
    * runnable on an infinite CDC feed. Same cross-batch ordering
    * limitation as [[sessionize]]: a late event can only reorder against
    * events in its own batch.
    */
  def scd2(
      events: Dataset[ScdEvent],
      horizonSec: Long = 86400L): Dataset[ScdOut] = {
    import events.sparkSession.implicits._

    def update(
        userId: Long,
        rows: Iterator[ScdEvent],
        state: GroupState[ScdState]): Iterator[ScdOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(ScdOut(userId, s.version, s.curType, s.validFrom, -1L,
          is_current = true))
      } else {
        val sorted = rows.toList
          .sortBy(e => (e.ts.getTime / 1000L, e.event_id))
        val out = List.newBuilder[ScdOut]
        var cur = state.getOption
        sorted.foreach { e =>
          val sec = e.ts.getTime / 1000L
          cur match {
            case None =>
              cur = Some(ScdState(e.event_type, sec, 1, sec))
            case Some(c) if c.curType != e.event_type =>
              out += ScdOut(userId, c.version, c.curType, c.validFrom, sec,
                is_current = false)
              cur = Some(ScdState(e.event_type, sec, c.version + 1, sec))
            case Some(c) => // no attribute change: version stays open
              cur = Some(c.copy(lastSec = math.max(c.lastSec, sec)))
          }
        }
        cur.foreach { c =>
          state.update(c)
          // Keyed on the LAST event seen, not the version start: a key
          // whose open version is old but still receiving no-change
          // events must not close while the feed is live.
          state.setTimeoutTimestamp((c.lastSec + horizonSec) * 1000L)
        }
        out.result().iterator
      }
    }

    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
