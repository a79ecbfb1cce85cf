package org.apache.spark

/** Test-only accessor for the `private[spark]` listener bus: specs that
  * assert on listener-observed deltas (job counts) must drain the async
  * bus deterministically instead of `Thread.sleep` (r18 ADVICE — fixed
  * sleeps flake on a steal-bursty host).
  */
object GraftTestBus {
  def waitUntilEmpty(sc: SparkContext, timeoutMs: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
