package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Point-in-time-correct feature computation — the feature-store
  * primitive every training pipeline needs: for each observation
  * (here: an order), aggregate the entity's OWN history strictly
  * BEFORE the observation, so a model trained on these rows never
  * sees the future ("label leakage"). The reference has no temporal
  * operators at all; this is the leakage-safe complement of our
  * as-of join ([[graft.operators.AsOfJoin]]), which picks the latest
  * single fact — here we aggregate a trailing window of facts.
  *
  * Determinism across engines is the whole design:
  *  - money enters as exact integer cents
  *    (`floor(price*100 + 0.5)` — the identical IEEE double ops on
  *    both engines), so trailing sums are integer and order-free;
  *  - the window frame is RANGE over an integer epoch-day key, never
  *    ROWS: two same-day orders are peers, and a ROWS frame would
  *    make their mutual visibility depend on tie order. RANGE with
  *    `1 PRECEDING` also excludes ALL same-day peers — the
  *    conservative leakage stance (same-day facts may not be
  *    available at serving time either).
  *
  * Scale shape: ONE hash shuffle on the entity key; both trailing
  * frames (90-day and lifetime) ride the same sort within it. No
  * joins, no driver state — at 100 TB this is exactly the
  * partitioning a feature-backfill job wants, and AQE can split a
  * hot entity only if the frame were re-expressed as an agg; for
  * windows, entity cardinality (1.5M customers at SF1 per TPC-H)
  * bounds the skew.
  */
object Features {

  /** Per-order trailing features over the customer's own order
    * history: count and spend in the trailing 90 days and lifetime,
    * both ending strictly before the order's day.
    */
  def pointInTimeFeatures(spark: SparkSession, sfDir: String): DataFrame =
    pointInTimeOf(Tables.orders(spark, sfDir).select(
      col("o_orderkey"), col("o_custkey"),
      datediff(col("o_orderdate").cast("date"),
        to_date(lit("1970-01-01"))).cast("long").as("day"),
      floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents")))

  /** Core over any prepared (o_orderkey, o_custkey, day, cents)
    * frame — integer day key, integer cents.
    */
  def pointInTimeOf(o: DataFrame): DataFrame = {
    val byCust = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
    val w90 = byCust.rangeBetween(-90, -1)
    val wLife = byCust.rangeBetween(Window.unboundedPreceding, -1)
    o.withColumn("prior_n_90d", count(lit(1)).over(w90))
      .withColumn("prior_cents_90d", coalesce(sum(col("cents")).over(w90), lit(0L)))
      .withColumn("prior_n_life", count(lit(1)).over(wLife))
      .withColumn("prior_cents_life", coalesce(sum(col("cents")).over(wLife), lit(0L)))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pit_features" -> pointInTimeFeatures _,
  )

  val oracles: Map[String, String] = Map(
    "q_pit_features" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(date_diff('day', DATE '1970-01-01',
        |                   CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT o_orderkey, o_custkey, day, cents,
        |  CAST(count(*) OVER w90 AS BIGINT) AS prior_n_90d,
        |  CAST(COALESCE(sum(cents) OVER w90, 0) AS BIGINT) AS prior_cents_90d,
        |  CAST(count(*) OVER wlife AS BIGINT) AS prior_n_life,
        |  CAST(COALESCE(sum(cents) OVER wlife, 0) AS BIGINT) AS prior_cents_life
        |FROM o
        |WINDOW
        |  w90 AS (PARTITION BY o_custkey ORDER BY day
        |          RANGE BETWEEN 90 PRECEDING AND 1 PRECEDING),
        |  wlife AS (PARTITION BY o_custkey ORDER BY day
        |            RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)""".stripMargin,
  )
}
