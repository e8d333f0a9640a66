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

  /** On-disk schema of the driver's events.parquet: `ts` is parquet
    * TIMESTAMP(NANOS), which these sessions read as nano longs
    * (spark.sql.legacy.parquet.nanosAsLong).
    */
  val EventsNanoSchema: StructType = StructType(
    EventsSchema.fields.map {
      case f if f.name == "ts" => f.copy(dataType = LongType)
      case f => f
    })

  /** File-source reader (parquet dir, append-only) over the driver's
    * events feed: nano longs are converted to a proper event-time
    * timestamp column so watermarks work downstream.
    */
  def readEvents(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(EventsNanoSchema).parquet(path)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

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
        val sorted = rows.map(_.ts.getTime / 1000L).toSeq.sorted
        var closed = List.empty[SessionOut]
        var cur = state.getOption
        sorted.foreach { sec =>
          cur match {
            // Late event from BEFORE the open session (out of order across
            // micro-batches but inside the watermark): extend the session
            // backwards when it is within the gap of the session start;
            // otherwise it is an isolated earlier session — emit it
            // directly rather than gluing it onto the current one.
            case Some(s) if sec < s.startSec =>
              if (s.startSec - sec <= gapSec)
                cur = Some(s.copy(startSec = sec, n = s.n + 1))
              else closed ::= SessionOut(userId, sec, sec, 1)
            case Some(s) if sec - s.endSec <= gapSec =>
              cur = Some(s.copy(endSec = math.max(s.endSec, sec), n = s.n + 1))
            case Some(s) =>
              closed ::= SessionOut(userId, s.startSec, s.endSec, s.n)
              cur = Some(SessionState(sec, sec, 1))
            case None =>
              cur = Some(SessionState(sec, sec, 1))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp((s.endSec + gapSec) * 1000L)
        }
        closed.reverseIterator
      }
    }

    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
