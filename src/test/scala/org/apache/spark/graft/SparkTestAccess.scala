package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only bridge into `private[spark]` surface: deterministic listener
  * drains. `QueryExecutionListener` events ride the shared async
  * `ListenerBus`; `waitUntilEmpty()` blocks until every event posted so
  * far has been DELIVERED, so an assertion made after it cannot be raced
  * by a late event (nor pass spuriously while one is still queued) — the
  * replacement for sleep-based lingers. */
object SparkTestAccess {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
