package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Package-placed accessor for `SparkContext.listenerBus.waitUntilEmpty()`
  * (private[spark], no public equivalent): the bench's per-query stage-time
  * attribution must drain the async listener bus between queries, or a
  * stage completed late would be charged to the NEXT query. Uses only the
  * public Spark distribution's own API surface, the same way Spark's test
  * utilities do.
  */
object ListenerDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
