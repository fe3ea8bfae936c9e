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

  /** `o_orderdate` / `l_shipdate` are the same hazard class as
    * `events.ts` (driver-generated parquet timestamps, re-encodable
    * between rounds) — route them through the SAME [[normalizeTs]]
    * dispatch, so a nanos or NTZ regeneration changes behavior in one
    * place. EncodingDriftSpec locks this in on the real fixtures.
    */
  def orders(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(table(s, d, "orders"), "o_orderdate")
  }
  def lineitem(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(table(s, d, "lineitem"), "l_shipdate")
  }

  /** The driver has generated `events.ts` under three different
    * parquet encodings across rounds: TIMESTAMP(NANOS) (Spark 4
    * refuses it by default — read as a nanos-since-epoch LONG via the
    * legacy flag, then integer-divide to micros, the same truncation
    * DuckDB applies), `timestamp[us]` without timezone (Spark reads
    * TIMESTAMP_NTZ — kept as-is: DuckDB sees the identical naive
    * micros, and the oracle hash-matches NTZ outputs), and plain
    * TIMESTAMP. [[normalizeTs]] dispatches on the actual type so a
    * future regeneration changes behavior in exactly one place.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(table(s, d, "events"))
  }

  /** Normalize a `ts` column from any encoding the driver has
    * generated: INT64 nanos (legacy nanosAsLong LONG → micros
    * TimestampType), TIMESTAMP / TIMESTAMP_NTZ (left untouched — both
    * carry the same microsecond values; NTZ is deliberately NOT
    * re-typed, because every events query's output schema is
    * oracle-hash-matched as NTZ). Works on batch and streaming frames
    * alike (pure schema dispatch + column expression).
    */
  def normalizeTs(df: DataFrame, name: String = "ts"): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    df.schema(name).dataType match {
      case LongType =>
        df.withColumn(name, timestamp_micros(expr(s"`$name` div 1000")))
      case _ => df
    }
  }

  /** Epoch microseconds of a timestamp column, exact for TIMESTAMP and
    * TIMESTAMP_NTZ inputs alike. The session timezone is pinned UTC
    * (GraftSession / Verify / Bench), so the NTZ→LTZ cast is the
    * identity on the underlying microsecond value and the result
    * matches DuckDB `epoch_us(ts)` on naive timestamps. Plain
    * `unix_micros` would crash at analysis on NTZ input — this is the
    * one sanctioned way to get epoch micros from `ts`.
    */
  def epochMicros(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    unix_micros(c.cast(org.apache.spark.sql.types.TimestampType))
  }
  /** Normalize a text column that a regeneration could ship as plain
    * parquet BYTE_ARRAY (no UTF8 annotation → Spark BinaryType): cast
    * back to string, so `getString` collects and every string builtin
    * keep working. No-op on today's string encoding.
    */
  def normalizeText(df: DataFrame, name: String = "text"): DataFrame = {
    import org.apache.spark.sql.types.{BinaryType, StringType}
    df.schema(name).dataType match {
      case BinaryType => df.withColumn(name,
        df.col(name).cast(StringType))
      case _ => df
    }
  }

  /** Normalize an embedding column a regeneration could widen to
    * `list<double>`: cast back to `array<float>` (lossless for
    * float-valued data widened on write), so `getSeq[Float]` collects
    * and the float-typed similarity kernels keep working. No-op on
    * today's float encoding.
    */
  def normalizeEmbedding(df: DataFrame, name: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
    df.schema(name).dataType match {
      case ArrayType(DoubleType, n) =>
        df.withColumn(name, df.col(name).cast(ArrayType(FloatType, n)))
      case _ => df
    }
  }

  def documents(s: SparkSession, d: String): DataFrame =
    normalizeText(table(s, d, "documents"))
  def embeddings(s: SparkSession, d: String): DataFrame =
    normalizeEmbedding(table(s, d, "embeddings"))
}
