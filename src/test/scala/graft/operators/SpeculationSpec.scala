package graft.operators

import graft.SparkSpec
import org.apache.spark.TaskContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerSpeculativeTaskSubmitted, SparkListenerTaskStart}
import java.util.concurrent.atomic.AtomicBoolean
import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** The reference coordinator re-issues a task when the original
  * worker is slow (coordinator.go:203-218: 10-second timeout → task
  * returns to the idle queue; README.MD:104-111). Spark's twin is
  * speculative execution — `spark.speculation` is on suite-wide in
  * [[graft.SparkSpec]] — and this spec exercises the live mechanism
  * end to end on an injected straggler:
  *
  *  1. detection: the scheduler marks the slow attempt speculatable
  *     (median-based, `SparkListenerSpeculativeTaskSubmitted` fires);
  *  2. re-issue: the straggling attempt is killed and rescheduled
  *     (`sc.killTaskAttempt`), the re-attempt finishes fast;
  *  3. exactly-once: the job result is exact despite two attempts of
  *     the same partition (Spark commits one attempt — the MapReduce
  *     commit-fencing story).
  *
  * Two local-mode notes, both scheduler-level constants: the periodic
  * speculation timer only starts on a cluster (`!isLocal` guard in
  * `TaskSchedulerImpl.start()`), so the test drives the same
  * `checkSpeculatableTasks()` call on the timer's cadence via
  * [[org.apache.spark.scheduler.SpeculationTestHook]]; and a backup
  * COPY can't be placed because all slots share one host (speculative
  * copies must land on a different host than the original), which is
  * why step 2 uses the kill-and-reschedule form of re-issue — the
  * same observable behavior as the reference's backup tasks.
  */
class SpeculationSpec extends SparkSpec {

  test("an injected straggler is detected, re-issued, and the result stays exact") {
    val sc = spark.sparkContext
    val speculationDetected = new AtomicBoolean(false)
    @volatile var stragglerTaskId = -1L
    val listener = new SparkListener {
      override def onTaskStart(t: SparkListenerTaskStart): Unit =
        if (t.taskInfo.index == 0 && t.taskInfo.attemptNumber == 0)
          stragglerTaskId = t.taskInfo.taskId
      override def onSpeculativeTaskSubmitted(
          s: SparkListenerSpeculativeTaskSubmitted): Unit =
        speculationDetected.set(true)
    }
    sc.addSparkListener(listener)
    @volatile var done = false
    val ticker = new Thread(() => {
      while (!done) {
        org.apache.spark.scheduler.SpeculationTestHook.kick(sc)
        Thread.sleep(100)
      }
    }, "speculation-ticker")
    ticker.setDaemon(true)
    try {
      val t0 = System.nanoTime()
      ticker.start()
      val job = Future {
        sc.parallelize(1 to 80, 8)
          .map { i =>
            val tc = TaskContext.get()
            // partition 0, first attempt: stall well past the
            // speculation threshold; any re-attempt computes instantly
            if (tc.partitionId == 0 && tc.attemptNumber == 0) {
              val deadline = System.nanoTime() + 30_000_000_000L
              while (System.nanoTime() < deadline && !tc.isInterrupted())
                Thread.sleep(20)
            }
            i.toLong
          }
          .sum()
      }
      // wait for the scheduler to flag the straggler, then re-issue it
      val waitDeadline = System.currentTimeMillis() + 20000
      while (!speculationDetected.get() && System.currentTimeMillis() < waitDeadline)
        Thread.sleep(50)
      assert(speculationDetected.get(),
        "scheduler never marked the straggler speculatable")
      assert(stragglerTaskId >= 0, "straggler task id not observed")
      sc.killTaskAttempt(stragglerTaskId, interruptThread = true,
        reason = "straggler re-issued (backup-task test)")
      val result = Await.result(job, 30.seconds)
      val elapsedSec = (System.nanoTime() - t0) / 1e9
      assert(result == (1 to 80).sum.toLong,
        "exactly-once result despite two attempts of partition 0")
      assert(elapsedSec < 30.0,
        f"re-issue should beat the 30s straggler, took $elapsedSec%.1fs")
    } finally {
      done = true
      sc.removeSparkListener(listener)
    }
  }
}
