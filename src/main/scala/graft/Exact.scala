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
  */
object Exact {
  /** Order-independent exact sum of a 2-decimal double column. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Order-independent mean: exact decimal sum / count, divided as doubles. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** SQL fragment mirroring [[dsum]] for the DuckDB oracle. */
  def sqlDsum(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(18,2))) AS DOUBLE)"

  /** SQL fragment mirroring [[davg]]. */
  def sqlDavg(expr: String): String =
    s"${sqlDsum(expr)} / COUNT($expr)"
}
