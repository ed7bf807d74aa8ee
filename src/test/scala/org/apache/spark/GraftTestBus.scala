package org.apache.spark

/** Test-only shim: flush the async listener bus so QueryExecutionListener
  * callbacks have fired before a spec asserts on captured plans. */
object GraftTestBus {
  def flush(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
