package org.apache.spark

/** `SparkContext.listenerBus` is `private[spark]`; Bench needs to drain
  * it between timed queries so a `SparkListener` accumulating task
  * metrics (shuffle bytes, spill) attributes every task of query N to
  * query N rather than leaking late-arriving `onTaskEnd` events into
  * query N+1's delta. Same one-file re-export pattern as
  * `org.apache.spark.sql.GraftBridge`. */
object GraftCoreBridge {
  /** Block until all queued listener events are dispatched; a timeout
    * degrades to slightly-misattributed bytes, never a bench failure. */
  def drainListenerBus(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty(10000L)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
