package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Fnv1a.fnv1a

/** The reference's on-disk formats as Spark sources/sinks.
  *
  * Intermediate shuffle files in the reference are line-oriented text,
  * `key \t value \n` (worker.go:115), parsed back by splitting on the
  * FIRST tab (worker.go:147 uses SplitN-like semantics via
  * `strings.Split(line, "\t")` taking parts[0]/parts[1]); blank lines
  * are skipped (worker.go:144-146). Spark's shuffle replaces these
  * files entirely in normal operation — this source exists to
  * interoperate with data the reference (or any MR system) already
  * wrote, and to write bucketed intermediates it could read back.
  */
object KVText {

  /** Read `key\tvalue` lines; splits on the first tab, skips blanks. */
  def readKV(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .withColumnRenamed("value", "line")
      .filter(length(trim(col("line"))) > 0)
      .select(
        substring_index(col("line"), "\t", 1).as("key"),
        // everything after the first tab (value may itself contain tabs)
        when(instr(col("line"), "\t") > 0,
          substring(col("line"), instr(col("line"), "\t") + lit(1), length(col("line"))))
          .otherwise(lit("")).as("value"))

  /** Write a (key, value) DataFrame as the reference's bucketed
    * tab-separated layout: `bucket=Y/part-*` with
    * `Y = fnv1a(key) % nBuckets` — the exact placement function of
    * worker.go:35-41,107-110 (`ihash(key) % nReduce`), so a reference
    * reduce task Y could consume bucket Y verbatim.
    */
  def writeBucketed(df: DataFrame, path: String, nBuckets: Int): Unit =
    df.select(
        pmod(fnv1a(col("key").cast("string")), lit(nBuckets)).as("bucket"),
        concat_ws("\t", col("key").cast("string"), col("value").cast("string")).as("line"))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").text(path)
}
