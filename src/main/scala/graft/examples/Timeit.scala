package graft.examples
import org.apache.spark.sql.SparkSession
object Timeit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(args(0))
    fn(spark, sfDir).write.mode("overwrite").format("noop").save() // warm
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    println(f"TIMEIT ${args(0)} ${(System.nanoTime()-t0)/1e9}%.2f sec")
    spark.stop()
  }
}
