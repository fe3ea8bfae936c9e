package org.apache.spark.scheduler

import org.apache.spark.SparkContext

/** Test-only accessor: local mode never starts the speculation TIMER
  * (`TaskSchedulerImpl.start()` guards the scheduling thread with
  * `!isLocal`), but the full speculation machinery — speculatable
  * marking, duplicate attempt launch, exactly-once commit of the
  * winning attempt — is live. [[kick]] drives exactly the call the
  * cluster-mode timer makes, letting SpeculationSpec exercise the
  * real path on local[n].
  */
object SpeculationTestHook {
  def kick(sc: SparkContext): Unit =
    sc.taskScheduler.asInstanceOf[TaskSchedulerImpl].checkSpeculatableTasks()
}
