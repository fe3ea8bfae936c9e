package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Source/sink formats beyond parquet: CSV and JSON round-trips with
  * explicit schemas, and the partitioned-parquet output layout used
  * for date-partitioned corpora at scale.
  */
class FormatsSpec extends SparkSpec {

  private def sample = graft.Tables.lineitem(spark, sf001)
    .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    .limit(100)

  test("csv round-trip with schema") {
    val dir = java.nio.file.Files.createTempDirectory("csv").toString
    val df = sample
    df.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(df.schema).option("header", "true").csv(dir)
    assert(back.count() == 100)
    assert(back.agg(sum("l_quantity")).head().getDouble(0)
      == df.agg(sum("l_quantity")).head().getDouble(0))
  }

  test("json round-trip with schema") {
    val dir = java.nio.file.Files.createTempDirectory("json").toString
    val df = sample
    df.write.mode("overwrite").json(dir)
    val back = spark.read.schema(df.schema).json(dir)
    assert(back.count() == 100)
    assert(back.select("l_returnflag").distinct().count()
      == df.select("l_returnflag").distinct().count())
  }

  test("orc round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("orc").toString
    val df = sample
    df.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() == 100)
    assert(back.schema == df.schema)
    assert(back.agg(sum("l_quantity")).head().getDouble(0)
      == df.agg(sum("l_quantity")).head().getDouble(0))
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = java.nio.file.Files.createTempDirectory("part").toString
    graft.Tables.lineitem(spark, sf001)
      .withColumn("ship_year", year(col("l_shipdate")))
      .write.mode("overwrite").partitionBy("ship_year").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("ship_year") === 1997)
    // partition pruning: only the 1997 directory is scanned
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() > 0)
    assert(scan.contains("PartitionFilters") || !scan.contains("ship_year=1996"),
      "expected partition filters in scan")
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("ship_year=")))
  }
}
