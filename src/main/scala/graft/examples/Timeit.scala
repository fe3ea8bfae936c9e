package graft.examples
import org.apache.spark.sql.SparkSession

/** Min-of-N timing for one or more registered queries in a single
  * bench-shaped JVM (local[32], shuffle=32, noop sink, one warm rep
  * per query before the timed reps). Usage:
  *   Timeit q_a[,q_b,...] [sfDir] [reps]
  */
object Timeit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def force(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    args(0).split(',').foreach { name =>
      force(name) // warm
      val times = (1 to reps).map(_ => force(name))
      println(f"TIMEIT $name min ${times.min}%.3f reps ${times.map(t => f"$t%.2f").mkString(",")} sec")
    }
    spark.stop()
  }
}
