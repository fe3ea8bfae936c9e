package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers for the DuckDB-oracle compare.
  *
  * Summing IEEE doubles is order-dependent; Spark's partial/final agg
  * order differs from DuckDB's sequential scan, so a raw `sum(double)`
  * can hash-mismatch the oracle in the last ulps. The source data is
  * money-like (2 decimal places), so we sum EXACTLY by casting to
  * decimal(18,2) first — decimal addition is associative — then cast
  * the result back to double. DuckDB mirrors it as
  * `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`.
  *
  * Boundary: the final decimal→double cast is engine-identical only
  * while `value · 10^scale < 2^53`. Below it, DuckDB's conversion
  * (int128→double, then ÷10^scale) starts from an EXACT double and
  * its single division is correctly rounded — same bits as
  * Spark/Java's correctly-rounded one-step conversion. Above it the
  * int128→double step itself rounds and the divide rounds AGAIN,
  * which can land one ulp off (observed on a 17-digit scale-4 second
  * moment). The gate-SF sums here stay orders of magnitude below the
  * line; anything that can cross it (second moments, large products)
  * must convert via [[graft.queries.Stats]]'s exact floor+fraction
  * split (`dbl`/`sqlDbl`) instead of a direct cast.
  */
object Exact {
  /** Cast a money-like double to exact decimal(18,2). */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Order-independent exact sum of a 2-decimal double column. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Exact revenue term: price * (1 - discount), in decimal. */
  def discPrice(price: Column, discount: Column): Column =
    dec2(price) * (lit(1).cast(DecimalType(18, 2)) - dec2(discount))

  /** Exact charge term: price * (1 - discount) * (1 + tax), in decimal. */
  def charge(price: Column, discount: Column, tax: Column): Column =
    discPrice(price, discount) * (lit(1).cast(DecimalType(18, 2)) + dec2(tax))

  /** Order-independent revenue sum as double; mirror with [[sqlRevenue]]. */
  def revenue(price: Column, discount: Column): Column =
    sum(discPrice(price, discount)).cast("double")

  /** SQL fragment mirroring [[revenue]]. */
  def sqlRevenue(price: String, discount: String): String =
    s"CAST(SUM(CAST($price AS DECIMAL(18,2)) * (1 - CAST($discount AS DECIMAL(18,2)))) AS DOUBLE)"

  /** Order-independent mean: exact decimal sum / count, divided as doubles. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** SQL fragment mirroring [[dsum]] for the DuckDB oracle. */
  def sqlDsum(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(18,2))) AS DOUBLE)"

  /** SQL fragment mirroring [[davg]]. */
  def sqlDavg(expr: String): String =
    s"${sqlDsum(expr)} / COUNT($expr)"
}
