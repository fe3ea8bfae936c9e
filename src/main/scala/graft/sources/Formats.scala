package graft.sources

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Columnar and text format sinks/sources beyond parquet: ORC and
  * schema'd CSV, exercised as full write→read roundtrips.
  *
  * The reference's only format is line-oriented text (`Key \t Value`,
  * `worker.go:115`; final output `key value`, `worker.go:167`) — its
  * whole format surface is [[KVText]]. A Spark engine feeding a
  * training pipeline additionally needs the columnar formats the
  * lake actually stores, and CSV for interchange. Each roundtrip
  * here writes a projection of `lineitem`, reads it back with an
  * EXPLICIT schema (schema inference over 100 TB means reading the
  * data twice — never infer at scale), and aggregates; the oracle
  * computes the same aggregate from the original parquet, so a
  * single lost or mangled row/value fails the gate.
  *
  * Writes land under java.io.tmpdir, fingerprinted by source dir so
  * concurrent scale factors don't collide. The write is part of the
  * measured operation on purpose — the cost of a format is its
  * write+read cycle, not just the scan.
  */
object Formats {

  private def fp(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .take(6).map("%02x".format(_)).mkString

  /** ORC sink → source → aggregate. Columnar like parquet (striped,
    * min/max indexed, predicate pushdown), so the read side keeps
    * pushed filters and pruned columns — asserted in FormatsSpec.
    */
  def orcRoundtripAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_orc_${fp(sfDir)}"
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"))
      .write.mode("overwrite").orc(path)
    spark.read.orc(path)
      .filter(col("l_quantity") > 10)
      .groupBy(col("l_returnflag"))
      .agg(graft.Exact.dsum(col("l_quantity")).as("sum_qty"),
        graft.Exact.dsum(col("l_extendedprice")).as("sum_price"),
        max(col("l_partkey")).as("max_part"),
        count(lit(1)).as("n"))
  }

  /** CSV sink → source → aggregate, with quoting exercised by a
    * synthesized delimiter-and-quote-laden column (the corpus text is
    * delimiter-clean, so stress the escaping deliberately) and
    * parsing pinned by an explicit schema + FAILFAST (silent
    * NULL-on-parse-error is how a corpus quietly loses rows; fail
    * loudly instead).
    */
  def csvRoundtripAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_csv_${fp(sfDir)}"
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        concat(col("lang"), lit(",\""), col("source"), lit("\"")).as("tricky"))
      .write.mode("overwrite").option("header", "true").csv(path)
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType),
      StructField("tricky", StringType)))
    spark.read.schema(schema)
      .option("header", "true").option("mode", "FAILFAST").csv(path)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_chars")).as("sum_chars"),
        max(col("tricky")).as("max_tricky"),
        countDistinct(col("source")).as("n_sources"))
  }
}
