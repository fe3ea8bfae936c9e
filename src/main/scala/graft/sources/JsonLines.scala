package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSON-lines source/sink with the at-scale discipline baked in.
  *
  * The reference's worker emits line-oriented text intermediates
  * (worker.go:115); JSONL is that idea with structure — the interchange
  * format corpora actually arrive in before parquet conversion. Two
  * rules make it survive 100 TB:
  *
  *  - the reader REQUIRES an explicit schema: Spark's JSON schema
  *    inference reads every byte of the input once before the real
  *    scan, doubling I/O on data that hasn't been columnarized yet —
  *    precisely where I/O is most expensive;
  *  - malformed lines land in a `_corrupt_record` column (PERMISSIVE)
  *    instead of failing the job, and [[toParquet]] splits them out so
  *    the conversion quarantines garbage rather than dropping or dying.
  */
object JsonLines {

  val CorruptCol = "_corrupt_record"

  /** Read JSONL with an explicit schema; malformed lines are captured
    * in `_corrupt_record`, well-formed ones have it null.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Write a DataFrame as JSONL (one JSON object per line). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** The ingestion step: JSONL → parquet, quarantining malformed
    * lines to `<out>/_corrupt` instead of silently dropping them.
    * Returns (#good, #corrupt).
    */
  def toParquet(spark: SparkSession, inPath: String, schema: StructType,
      outPath: String): (Long, Long) = {
    val raw = read(spark, inPath, schema).cache()
    try {
      val good = raw.filter(col(CorruptCol).isNull).drop(CorruptCol)
      val bad = raw.filter(col(CorruptCol).isNotNull).select(col(CorruptCol))
      good.write.mode("overwrite").parquet(outPath)
      val nBad = bad.count()
      if (nBad > 0)
        bad.write.mode("overwrite").text(s"$outPath/_corrupt")
      (good.count(), nBad)
    } finally raw.unpersist()
  }
}
