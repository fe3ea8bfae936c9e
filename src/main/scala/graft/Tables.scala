package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated Parquet star schema (TESTDATA.md).
  *
  * One function per table; every query module takes `sfDir` (e.g.
  * `/root/testdata/sf0.01`) so the same code runs at any scale factor.
  * Reads are plain `spark.read.parquet` — Catalyst pushes filters and
  * prunes columns into the scan, which is what makes the plans hold at
  * 100 TB (partitioned parquet + pushdown, no driver-side work).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses by
    * default (PARQUET_TYPE_ILLEGAL). Read it as nanos-since-epoch LONG
    * via the legacy flag, then integer-divide to micros — identical to
    * the truncation DuckDB applies, so both engines see the same
    * microsecond TimestampType values (FIXTURES.md).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val raw = table(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
