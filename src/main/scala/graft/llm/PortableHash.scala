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

  /** Fixed random 31-bit odd multipliers / offsets for the 16-member
    * affine MinHash family `(a_i·h + b_i) mod (2³¹−1)`. `a` must be
    * LARGE and random: small multipliers (an earlier `2i+3` draft)
    * leave the family members mutually correlated — nearly monotone in
    * h — which produced 129 false-positive near-dup clusters on a
    * 6000-doc ground-truth corpus (DedupScaleSpec). 31-bit a × 31-bit
    * h tops out at 2⁶² so every intermediate still fits int64 — DuckDB
    * errors on overflow where Spark wraps, so that bound is what keeps
    * the oracle portable.
    */
  val MinhashA: Seq[Long] = Seq(
    114060685L, 143607339L, 658016613L, 1920833001L, 1625018799L,
    2115868157L, 1839658157L, 1370607937L, 1314768563L, 1516846533L,
    899342927L, 1761721497L, 1792449689L, 2056989733L, 1252576877L,
    638180913L)
  val MinhashB: Seq[Long] = Seq(
    516347110L, 86660097L, 1034123047L, 390694562L, 1490082986L,
    1456092803L, 997229158L, 1263980513L, 768208873L, 373428980L,
    381249819L, 1284903394L, 434862590L, 97658013L, 635475301L,
    570517314L)

  /** Affine MinHash mix over a 31-bit base hash, family member `i`
    * (a Column over 0..15): `(a_i·h + b_i) mod (2³¹−1)`.
    */
  def minhashMix(h: Column, i: Column): Column = {
    val aArr = array(MinhashA.map(lit): _*)
    val bArr = array(MinhashB.map(lit): _*)
    (element_at(aArr, i + 1) * h + element_at(bArr, i + 1)) % lit(2147483647L)
  }

  /** SQL mirror of [[minhashMix]] (DuckDB lists are 1-indexed). */
  def sqlMinhashMix(h: String, i: String): String = {
    val aList = MinhashA.mkString("[", ",", "]")
    val bList = MinhashB.mkString("[", ",", "]")
    s"($aList[$i+1]*$h + $bList[$i+1]) % 2147483647"
  }
}
