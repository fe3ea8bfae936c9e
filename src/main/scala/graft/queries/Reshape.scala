package graft.queries

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Profile

/** Reshaping and metadata operators: unpivot (melt), single-pass
  * data-quality profiling, and schema-evolution reads.
  */
object Reshape {

  /** Wide per-flag aggregates melted to long (flag, metric, value)
    * rows — the inverse of [[StarSchema]]'s pivot, via the native
    * `unpivot` operator (an Expand node: each input row fans out to
    * one row per value column in the SAME stage, no shuffle added).
    */
  def unpivotLineitemAggs(spark: SparkSession, sfDir: String): DataFrame = {
    val wide = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(graft.Exact.dsum(col("l_quantity")).as("sum_qty"),
        graft.Exact.dsum(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).cast("double").as("n_lines"))
    wide.unpivot(
      Array(col("l_returnflag")),
      Array(col("sum_qty"), col("sum_price"), col("n_lines")),
      "metric", "value")
  }

  /** One-scan profile of the events table (see [[Profile]]). */
  def profileEvents(spark: SparkSession, sfDir: String): DataFrame =
    Profile.profile(
      Tables.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value")),
      Seq("event_id", "user_id", "event_type", "value"))

  /** Schema evolution across parquet batches: batch 1 carries
    * (key, price), batch 2 carries (key, priority); a mergeSchema
    * read unions the schemas and nulls the absent columns — the
    * shape of a lake whose producers add fields over time. The
    * aggregate counts both column populations and re-sums the
    * price, so a dropped batch, a mis-merged column, or a
    * null-for-present value all fail the oracle (plain arithmetic
    * over the original table).
    */
  def schemaEvolutionRead(spark: SparkSession, sfDir: String): DataFrame = {
    val fp = MessageDigest.getInstance("MD5").digest(sfDir.getBytes("UTF-8"))
      .take(6).map("%02x".format(_)).mkString
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_evo_$fp"
    val o = Tables.orders(spark, sfDir)
    o.select(col("o_orderkey"), col("o_totalprice"))
      .write.mode("overwrite").parquet(s"$path/batch=1")
    o.select(col("o_orderkey"), col("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$path/batch=2")
    spark.read.option("mergeSchema", "true").option("basePath", path)
      .parquet(s"$path/batch=1", s"$path/batch=2")
      .agg(count(lit(1)).as("n_rows"),
        count(col("o_totalprice")).as("n_price"),
        count(col("o_orderpriority")).as("n_prio"),
        countDistinct(col("o_orderkey")).as("n_keys"),
        graft.Exact.dsum(col("o_totalprice")).as("sum_price"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_unpivot" -> unpivotLineitemAggs _,
    "q_profile" -> profileEvents _,
    "q_schema_evolution" -> schemaEvolutionRead _,
  )

  private def profSql(c: String, numeric: Boolean): Seq[String] = {
    val base = Seq(
      s"SELECT '$c' AS column_name, 'n_null' AS metric, " +
        s"CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS DOUBLE) AS value FROM events",
      s"SELECT '$c', 'n_distinct', CAST(COUNT(DISTINCT $c) AS DOUBLE) FROM events")
    if (numeric) base ++ Seq(
      s"SELECT '$c', 'min', CAST(MIN($c) AS DOUBLE) FROM events",
      s"SELECT '$c', 'max', CAST(MAX($c) AS DOUBLE) FROM events")
    else base
  }

  val oracles: Map[String, String] = Map(
    "q_unpivot" ->
      """WITH w AS (
        |  SELECT l_returnflag,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |    CAST(count(*) AS DOUBLE) AS n_lines
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
        |UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM w
        |UNION ALL SELECT l_returnflag, 'n_lines', n_lines FROM w""".stripMargin,
    "q_profile" ->
      (profSql("event_id", numeric = true) ++
        profSql("user_id", numeric = true) ++
        profSql("event_type", numeric = false) ++
        profSql("value", numeric = true)).mkString(" UNION ALL "),
    "q_schema_evolution" ->
      """SELECT 2 * count(*) AS n_rows, count(*) AS n_price,
        |  count(*) AS n_prio, count(DISTINCT o_orderkey) AS n_keys,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders""".stripMargin,
  )
}
