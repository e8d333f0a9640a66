package graft.perf

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.GraftListenerBridge
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Deterministic per-query execution counters (r13 VERDICT #1): on this
  * virtualized host, wall-clock is fogged by hypervisor steal (~2.6×
  * probe inflation in every driver window since r10), so plan
  * regressions hide inside the noise band. Shuffle bytes, task counts
  * and stage counts are properties of the PLAN + DATA, not the host:
  * identical code on identical data reproduces them exactly (modulo AQE
  * coalescing, which is itself deterministic at fixed config), so a
  * memoized-tree blowup or a lost broadcast shows up as a hard counter
  * step even when the wall numbers swing 2×.
  *
  * Snapshot deltas are only exact after the async listener bus drains —
  * callers go through [[deltaSince]], which drains first.
  */
final class PerfCounters extends SparkListener {

  /** One counter snapshot (cumulative since listener registration). */
  final case class Snap(
      tasks: Long,
      stages: Long,
      shuffleReadBytes: Long,
      shuffleWriteBytes: Long,
      recordsRead: Long) {
    def -(o: Snap): Snap = Snap(
      tasks - o.tasks, stages - o.stages,
      shuffleReadBytes - o.shuffleReadBytes,
      shuffleWriteBytes - o.shuffleWriteBytes,
      recordsRead - o.recordsRead)
  }

  private val tasks = new AtomicLong(0L)
  private val stages = new AtomicLong(0L)
  private val sread = new AtomicLong(0L)
  private val swrite = new AtomicLong(0L)
  private val inRecords = new AtomicLong(0L)

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    tasks.incrementAndGet()
    val m = t.taskMetrics
    if (m != null) {
      sread.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      swrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      inRecords.addAndGet(m.inputMetrics.recordsRead)
    }
  }

  override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
    stages.incrementAndGet()

  private def snap(): Snap =
    Snap(tasks.get(), stages.get(), sread.get(), swrite.get(), inRecords.get())

  /** Drain the listener bus, then return the counters accumulated since
    * `prev` (pass [[zero]] for absolute numbers).
    */
  def deltaSince(spark: SparkSession, prev: Snap): Snap = {
    GraftListenerBridge.drain(spark.sparkContext)
    snap() - prev
  }

  def zero: Snap = Snap(0L, 0L, 0L, 0L, 0L)

  /** Current snapshot AFTER a bus drain (exact, not racy). */
  def current(spark: SparkSession): Snap = deltaSince(spark, zero)
}
