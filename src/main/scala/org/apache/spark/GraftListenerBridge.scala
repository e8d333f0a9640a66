package org.apache.spark

/** Minimal bridge into the package-private `SparkContext.listenerBus`:
  * task/stage-end events arrive on an ASYNC queue, so per-query metric
  * deltas read from a `SparkListener`'s accumulators are only exact
  * after the bus drains. `LiveListenerBus.waitUntilEmpty()` is public,
  * but the bus reference itself is `private[spark]` — this one-liner is
  * the whole bridge (same convention as sql.GraftPlanBridge).
  */
object GraftListenerBridge {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
