package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Deterministic listener-bus drain for Bench's per-query resource
  * attribution. Bench snapshots spill/peak-memory counters around each
  * timed query; the listener bus is asynchronous, so without a drain a
  * straggler task-end event bleeds into the NEXT query's row. The
  * previous fixed 150 ms sleep bounded that error only probabilistically
  * — `waitUntilEmpty` bounds it deterministically. The bus handle and
  * the method are `private[spark]`, hence this one-call accessor in a
  * spark subpackage (public Spark source API, no behavior of its own).
  */
object ListenerBusDrain {

  /** Block until every queued listener event has been dispatched, or
    * the timeout elapses. Returns false on timeout (telemetry callers
    * proceed with possibly-bleeding attribution, as before).
    */
  def drain(sc: SparkContext, timeoutMillis: Long): Boolean =
    try {
      sc.listenerBus.waitUntilEmpty(timeoutMillis)
      true
    } catch {
      case _: java.util.concurrent.TimeoutException => false
    }
}
