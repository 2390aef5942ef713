package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Listener-bus drain bridge.
  *
  * `SparkContext.listenerBus` and `LiveListenerBus.waitUntilEmpty`
  * are `private[spark]` (they are Spark's own test-support surface),
  * but a benchmark that attributes per-query executor metrics through
  * a `SparkListener` NEEDS a drain barrier: listener delivery is
  * async, so reading the accumulated counters right after an action
  * returns races the bus and mis-attributes the tail of query N's
  * stages to query N+1. Polling with sleeps (the pattern the test
  * suite uses for `QueryExecutionListener`) costs a fixed latency per
  * query — ~231 queries × 100 ms would dominate cheap queries'
  * measurements — while the real drain call returns as soon as every
  * queue is empty.
  *
  * Like [[org.apache.spark.sql.graftbridge.ColumnBridge]], this
  * object lives in an `org.apache.spark.*` subpackage solely to
  * satisfy the access qualifier and forwards 1:1.
  */
object ListenerBridge {
  /** Block until every queued listener event is delivered (or the
    * timeout passes — best-effort by design: a stuck bus should
    * degrade metric attribution, not hang the bench). */
  def drain(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
