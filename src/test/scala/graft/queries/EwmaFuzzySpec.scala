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
    // series can never appear. Row numbers must come from the SAME
    // gap-filled spine the anomaly series runs on — the sparse hourly
    // series numbers rows differently wherever hours are missing.
    val withRn = Incremental.gapFilledHourly(spark, sf001).withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("hour"))))
      .select(col("event_type").as("et"), col("hour").as("h"), col("rn"))
    val joined = df.join(withRn,
      col("event_type") === col("et") && col("hour") === col("h"))
    assert(joined.count() == df.count(), "every anomaly row is on the spine")
    assert(joined.where(col("rn") <= 12).count() == 0)
    df.unpersist()
  }

  test("entry/exit: planted sessions split on the 30-min gap; bounces counted") {
    import spark.implicits._
    // user 1: three events 10 min apart (one session, entry 5, exit 7),
    // then a 31-min gap and one lone event (a bounce on page 9);
    // user 2: a single event (bounce on page 5).
    def t(min: Long) = new java.sql.Timestamp(min * 60000L)
    val events = Seq(
      (1L, t(0), 1L, """{"k": 5}"""),
      (1L, t(10), 2L, """{"k": 6}"""),
      (1L, t(20), 3L, """{"k": 7}"""),
      (1L, t(51), 4L, """{"k": 9}"""),
      (2L, t(5), 5L, """{"k": 5}"""))
      .toDF("user_id", "ts", "event_id", "props")
    val rows = EventWindows.entryExitOf(events).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows == Map(
      (5, 7) -> ((1L, 0L)),   // user 1 session 1: entry 5, exit 7, no bounce
      (9, 9) -> ((1L, 1L)),   // user 1 session 2: lone event = bounce
      (5, 5) -> ((1L, 1L)))) // user 2: lone event = bounce
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
