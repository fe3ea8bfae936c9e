package graft.operators

import graft.SparkSpec
import org.apache.spark.TaskContext
import java.util.concurrent.atomic.AtomicInteger

/** The reference's signature behavior is task re-execution on worker
  * death with zombie-commit fencing: a map task that dies is handed
  * to another worker (coordinator.go:50, coordinator.go:203-218), and
  * a late commit from the dead attempt must not corrupt the output
  * (the rename-commit protocol; README.MD:104-111 — the analog of
  * 6.824 test-mr.sh's crash test). Spark's twin is task retry
  * (`spark.task.maxFailures`, live suite-wide via the shared
  * `local[4, 2]` master) plus `FileOutputCommitter`'s
  * attempt-directory commit. This spec injects both failure shapes:
  *
  *  - compute retry: a task throws on its first attempt; the retry
  *    must succeed and the job result must be exact;
  *  - commit fencing: a WRITE task emits part of its rows and then
  *    dies; the committed output must contain exactly one copy of
  *    every row — nothing from the dead attempt's partial file.
  */
class CrashRecoverySpec extends SparkSpec {

  test("a task that crashes on first attempt is retried and the result stays exact") {
    CrashRecoverySpec.computeCrashes.set(0)
    val sum = spark.sparkContext.parallelize(1 to 80, 8)
      .map { i =>
        val tc = TaskContext.get()
        if (tc.partitionId == 3 && tc.attemptNumber == 0) {
          CrashRecoverySpec.computeCrashes.incrementAndGet()
          throw new RuntimeException("injected worker crash (first attempt)")
        }
        i.toLong
      }
      .sum()
    assert(sum == (1 to 80).sum.toLong, "retried job must compute the exact result")
    assert(CrashRecoverySpec.computeCrashes.get() == 1,
      "the injected crash must have actually fired (exactly once)")
  }

  test("a write task dying mid-partition leaves exactly-once committed output") {
    import spark.implicits._
    CrashRecoverySpec.writeCrashes.set(0)
    val path = java.nio.file.Files
      .createTempDirectory("graft_crash_sink").toString + "/out"
    val n = 400L
    // partition 2's first attempt writes roughly half its rows into
    // its attempt file, then dies — those rows are in a file the
    // committer must discard
    spark.range(0L, n, 1L, 4).as[Long]
      .map { v =>
        val tc = TaskContext.get()
        if (tc.partitionId == 2 && tc.attemptNumber == 0 && v % 100L == 50L) {
          CrashRecoverySpec.writeCrashes.incrementAndGet()
          throw new RuntimeException("injected crash mid-write")
        }
        v
      }
      .write.mode("overwrite").parquet(path)
    assert(CrashRecoverySpec.writeCrashes.get() >= 1,
      "the injected mid-write crash must have actually fired")
    val got = spark.read.parquet(path).as[Long].collect().sorted
    assert(got.length == n,
      s"expected $n rows exactly once, got ${got.length} " +
        "(duplicates would mean the dead attempt's partial file was committed)")
    assert(got.toSeq == (0L until n), "committed rows must be exactly 0..n-1")
  }
}

object CrashRecoverySpec {
  // static so executor threads (same JVM in local mode) and the
  // driver assertion see the same counters
  val computeCrashes = new AtomicInteger(0)
  val writeCrashes = new AtomicInteger(0)
}
