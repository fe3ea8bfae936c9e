package graft.examples

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-replication spill/shuffle accounting for one registered query
  * (VERDICT r12 item 8: containment's 56–91 s ±25% replication band —
  * decide with numbers whether the spread is spill sensitivity worth
  * engineering away). Runs `SparkEntry.queries(name)` `reps` times
  * through the bench's noop sink, a task-metrics listener summing
  * disk-spill, memory-spill, and shuffle-write bytes per rep.
  *
  * Usage: SpillProbe <sfDir> <queryName> [reps=3]
  */
object SpillProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val diskSpill = new java.util.concurrent.atomic.AtomicLong()
    val memSpill = new java.util.concurrent.atomic.AtomicLong()
    val shufWrite = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          diskSpill.addAndGet(m.diskBytesSpilled)
          memSpill.addAndGet(m.memoryBytesSpilled)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // warmup outside the accounted reps (bench discipline)
    force(graft.SparkEntry.queries("mr_grep")(spark, sfDir))

    (1 to reps).foreach { i =>
      Thread.sleep(2000) // drain the async listener bus
      diskSpill.set(0L); memSpill.set(0L); shufWrite.set(0L)
      val t0 = System.nanoTime()
      force(graft.SparkEntry.queries(name)(spark, sfDir))
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000)
      println(f"[spill] $name rep=$i sec=$sec%8.1f " +
        f"diskSpill=${diskSpill.get / 1e9}%8.2f GB " +
        f"memSpill=${memSpill.get / 1e9}%8.2f GB " +
        f"shuffleWrite=${shufWrite.get / 1e9}%8.2f GB")
    }
    spark.stop()
  }
}
