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
  import org.apache.spark.sql.graft.Bridge

  /** 60-bit md5-derived hash of a string column — the fused native
    * [[graft.functions.H60]] expression (identical values to
    * `conv(substr(md5(c),1,15),16,10)`, fewer allocations).
    */
  def h60(c: Column): Column =
    Bridge.column(graft.functions.H60(Bridge.expression(c)))

  /** Salted variant: independent hash function per salt. */
  def h60(c: Column, salt: Column): Column = h60(concat(c, lit("#"), salt))

  /** SQL mirror of [[h60]]. */
  def sqlH60(expr: String): String =
    s"CAST('0x' || substr(md5($expr), 1, 15) AS BIGINT)"

  /** Bind an expensive array-valued expression to a lambda variable so
    * it is evaluated ONCE per row: `transform(array(e), v -> body)[1]`.
    *
    * Load-bearing for performance: higher-order functions re-evaluate
    * argument expression trees on every element access, so e.g.
    * `element_at(filter(split(text)), i)` inside a transform lambda
    * re-splits the text per shingle — O(tokens²) per document. Binding
    * restores O(tokens). Semantically a no-op, and both engines agree
    * (DuckDB mirror: `list_transform([e], v -> body)[1]` — though
    * DuckDB's vectorized executor doesn't need it for speed).
    */
  def bind(value: Column)(body: Column => Column): Column =
    element_at(transform(array(value), v => body(v)), 1)

  /** Affine MinHash mix over a 31-bit base hash: family member `i` is
    * `((2i+3)·h + 7919i + 17) mod (2³¹−1)` — all intermediates fit
    * int64, so DuckDB (which errors on overflow, unlike Spark's
    * silent wrap) computes it identically.
    */
  def minhashMix(h: Column, i: Column): Column =
    ((lit(2) * i + lit(3)) * h + lit(7919) * i + lit(17)) % lit(2147483647L)

  /** SQL mirror of [[minhashMix]]. */
  def sqlMinhashMix(h: String, i: String): String =
    s"((2*$i+3)*$h + 7919*$i + 17) % 2147483647"
}
