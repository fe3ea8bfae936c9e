package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{AsOfJoin, Skew}

/** Advanced composed operators as oracle-checked queries: as-of join
  * and skew-salted aggregation.
  */
object Advanced {

  /** For every purchase event, the latest error event of the same
    * user at-or-before it (point-in-time join; DuckDB ASOF LEFT JOIN
    * is the oracle).
    */
  def asofPurchaseError(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    // dedupe the reference side per (key, time): both engines pick an
    // arbitrary row when right-side timestamps tie, so make the tie
    // impossible deterministically (max value per instant)
    val errors = ev.filter(col("event_type") === "error")
      .groupBy(col("user_id"), col("ts").as("err_ts"))
      .agg(max(col("value")).as("err_value"))
      .select(col("user_id"), col("err_ts"), col("err_value"))
    AsOfJoin.asof(purchases, errors, "user_id", "ts", "err_ts")
  }

  /** Event counts via the two-stage salted aggregation — result
    * identical to a plain groupBy count (which IS the oracle); the
    * point is the skew-safe physical shape.
    */
  def saltedTypeCount(spark: SparkSession, sfDir: String): DataFrame =
    Skew.saltedCount(Tables.events(spark, sfDir), "event_type")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> asofPurchaseError _,
    "q_salted_count" -> saltedTypeCount _,
  )

  val oracles: Map[String, String] = Map(
    "q_asof_join" ->
      """SELECT p.user_id, p.event_id, p.ts, p.value,
        |  e.err_ts AS asof_err_ts, e.err_value AS asof_err_value
        |FROM (SELECT user_id, event_id, ts, value FROM events
        |      WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, ts AS err_ts, max(value) AS err_value
        |                FROM events WHERE event_type = 'error'
        |                GROUP BY user_id, ts) e
        |  ON p.user_id = e.user_id AND p.ts >= e.err_ts""".stripMargin,
    "q_salted_count" ->
      "SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type",
  )
}
