package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.Tables
import graft.operators.Profile

class ReshapeSpec extends SparkSpec {

  test("unpivot melts each wide row into one row per value column") {
    val out = Reshape.unpivotLineitemAggs(spark, sf001)
    val nFlags = Tables.lineitem(spark, sf001)
      .select(col("l_returnflag")).distinct().count()
    assert(out.count() === nFlags * 3)
    assert(out.select(col("metric")).distinct().count() === 3)
    // melted value matches the direct aggregate for one cell
    val direct = Tables.lineitem(spark, sf001)
      .groupBy(col("l_returnflag")).agg(count(lit(1)).cast("double").as("v"))
    val melted = out.filter(col("metric") === "n_lines")
      .select(col("l_returnflag"), col("value").as("v"))
    assert(melted.exceptAll(direct).count() === 0)
  }

  test("profile computes nulls/ndv/extents in a single aggregate pass") {
    val prof = Profile.profile(
      Tables.events(spark, sf001).select(col("event_id"), col("value"),
        col("event_type")),
      Seq("event_id", "value", "event_type")).collect()
    val byKey = prof.map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val n = Tables.events(spark, sf001).count()
    assert(byKey(("event_id", "n_null")) === 0.0)
    assert(byKey(("event_id", "n_distinct")) === n.toDouble)
    assert(byKey(("event_type", "n_distinct")) > 0)
    assert(byKey(("value", "max")) >= byKey(("value", "min")))
    // string columns carry no min/max metric
    assert(!byKey.contains(("event_type", "min")))
  }

  test("profile plan is one scan, not one scan per column") {
    val df = Profile.profile(
      Tables.events(spark, sf001).select(col("event_id"), col("value")),
      Seq("event_id", "value"))
    val scans = "Scan parquet".r
      .findAllIn(df.queryExecution.executedPlan.toString).size
    assert(scans === 1, s"expected 1 scan, got $scans")
  }

  test("mergeSchema read sees both batches' columns with correct nulls") {
    val out = Reshape.schemaEvolutionRead(spark, sf001).collect()(0)
    val n = Tables.orders(spark, sf001).count()
    assert(out.getAs[Long]("n_rows") === 2 * n)
    assert(out.getAs[Long]("n_price") === n)
    assert(out.getAs[Long]("n_prio") === n)
    assert(out.getAs[Long]("n_keys") === n)
  }
}
