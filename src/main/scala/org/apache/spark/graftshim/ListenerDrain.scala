package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Dev-only bridge for the bench's per-key job-stats profiling
  * (`SPARK_GRAFT_JOBSTATS=1`): flush the async listener bus so per-key
  * job/stage/task counters are attributed to the key that ran them, not
  * the next one. `listenerBus.waitUntilEmpty()` is `private[spark]`. */
object ListenerDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
