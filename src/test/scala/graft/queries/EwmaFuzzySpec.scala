package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for the dyadic EWMA and the blocked fuzzy name join
  * (cross-engine value equality is the DuckDB oracle's job).
  */
class EwmaFuzzySpec extends SparkSpec {

  test("ewma: head rows average partially, steady state uses weight 255") {
    val df = EventWindows.ewma(spark, sf001).cache()
    assert(df.count() > 0)
    // first row of each series has no lags: wtot = 128, ewma = cnt
    val first = df.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("hour"))))
      .where(col("rn") === 1)
    assert(first.where(col("wtot") =!= 128L).count() == 0)
    assert(first.where(col("ewma") =!= col("cnt").cast("double")).count() == 0)
    // from the 8th observation on, all weights present: wtot = 255
    val steady = df.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("hour"))))
      .where(col("rn") >= 8)
    assert(steady.count() > 0)
    assert(steady.where(col("wtot") =!= 255L).count() == 0)
    // ewma bounded by the window's min/max counts is implied by
    // convexity; spot-check positivity instead (exact ints)
    assert(df.where(col("wsum") < col("cnt") * 128).count() == 0)
  }

  test("anomaly z-scores: flags iff |z| >= 3, moments consistent, never head rows") {
    val df = EventWindows.anomalies(spark, sf001).cache()
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cnt, mean, variance, z, flag) = (r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getBoolean(6))
      assert(variance > 0)
      assert(math.abs(z - (cnt - mean) / math.sqrt(variance)) < 1e-9)
      assert(flag == (math.abs(z) >= 3.0))
    }
    // the >= 12 trailing-bucket guard: the first 12 rows of every
    // series can never appear
    val withRn = EventWindows.ewma(spark, sf001).withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("hour"))))
      .select(col("event_type").as("et"), col("hour").as("h"), col("rn"))
    val joined = df.join(withRn,
      col("event_type") === col("et") && col("hour") === col("h"))
    assert(joined.where(col("rn") <= 12).count() == 0)
    df.unpersist()
  }

  test("fuzzy join: blocked, ordered, distance-banded, and distinct-first") {
    val df = Advanced.fuzzyNameJoin(spark, sf001).cache()
    assert(df.count() > 0)
    assert(df.where(col("dist") < 1 || col("dist") > 4).count() == 0)
    assert(df.where(col("name_a") >= col("name_b")).count() == 0)
    // blocking invariant: matched names share their first token
    assert(df.where(substring_index(col("name_a"), " ", 1) =!=
      substring_index(col("name_b"), " ", 1)).count() == 0)
    // distinct-first: no pair appears twice
    assert(df.groupBy(col("name_a"), col("name_b")).count()
      .where(col("count") > 1).count() == 0)
  }
}
