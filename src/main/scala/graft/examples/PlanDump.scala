package graft.examples
import org.apache.spark.sql.SparkSession

/** Dump the formatted physical plan of EVERY registered query (or a
  * comma-separated subset) to one file per query under an output
  * directory — the round-16 whole-suite plan audit instrument.
  * Usage: PlanDump <outDir> [q_a,q_b,...] [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val names =
      if (args.length > 1 && args(1).nonEmpty && args(1) != "-")
        args(1).split(',').toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { q =>
      try {
        val df = graft.SparkEntry.queries(q)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"$q.txt"),
          plan.getBytes("UTF-8"))
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $q failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
