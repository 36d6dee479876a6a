package org.apache.spark.sql.graft

import org.apache.spark.SparkContext

/** Accessor for the `private[spark]` listener bus. Task-end events are
  * delivered to registered listeners asynchronously, so reading a
  * metrics listener right after an action races the queue; proof
  * tooling ([[graft.ScaleProof]]) drains the bus first and then reads a
  * complete picture. */
object ListenerDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
