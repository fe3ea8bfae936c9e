package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hashing for the LLM-pipeline operators.
  *
  * Spark's `hash()`/`xxhash64()` are Murmur3/xxHash with Spark-private
  * seeds — not reproducible in the DuckDB oracle. Instead we derive a
  * 60-bit non-negative integer from the md5 hex digest, which both
  * engines compute identically over UTF-8:
  *
  *   Spark:  conv(substr(md5(s), 1, 15), 16, 10)  :: long
  *   DuckDB: CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)
  *
  * 15 hex digits = 60 bits, so the value fits signed int64 with no
  * sign wrangling. Independent hash families (MinHash permutations,
  * SimHash token hashes) are derived by salting the input rather than
  * by affine (a*h+b) % p transforms — salting sidesteps 64-bit
  * overflow portability entirely.
  */
object PortableHash {
  /** 60-bit md5-derived hash of a string column. */
  def h60(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Salted variant: independent hash function per salt. */
  def h60(c: Column, salt: Column): Column = h60(concat(c, lit("#"), salt))

  /** SQL mirror of [[h60]]. */
  def sqlH60(expr: String): String =
    s"CAST('0x' || substr(md5($expr), 1, 15) AS BIGINT)"
}
