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
  def events(s: SparkSession, d: String): DataFrame    = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
