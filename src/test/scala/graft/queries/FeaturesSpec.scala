package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Point-in-time trailing features: leakage-freedom (nothing from
  * the observation's own day or later ever enters a feature) and
  * frame arithmetic on a planted history, plus structural checks on
  * the real table.
  */
class FeaturesSpec extends SparkSpec {

  test("planted history: trailing frames are exclusive and day-ranged") {
    import spark.implicits._
    val o = Seq(
      // customer 7: spaced orders
      (1L, 7L, 0L, 1000L),
      (2L, 7L, 30L, 2000L),   // 90d window sees day 0
      (3L, 7L, 100L, 3000L),  // [10,99]: sees only day 30
      (4L, 7L, 130L, 4000L),  // [40,129]: sees only day 100
      // customer 8: two SAME-day orders — must not see each other
      (5L, 8L, 10L, 500L),
      (6L, 8L, 10L, 700L)
    ).toDF("o_orderkey", "o_custkey", "day", "cents")
    val r = Features.pointInTimeOf(o)
      .select(col("o_orderkey"), col("prior_n_90d"), col("prior_cents_90d"),
        col("prior_n_life"), col("prior_cents_life"))
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(r(0) == ((1L, 0L, 0L, 0L, 0L)), s"first order sees nothing: ${r(0)}")
    assert(r(1) == ((2L, 1L, 1000L, 1L, 1000L)), s"day 30 sees day 0: ${r(1)}")
    assert(r(2) == ((3L, 1L, 2000L, 2L, 3000L)),
      s"day 100's 90d frame [10,99] drops day 0: ${r(2)}")
    assert(r(3) == ((4L, 1L, 3000L, 3L, 6000L)),
      s"day 130's 90d frame [40,129] keeps only day 100: ${r(3)}")
    assert(r(4) == ((5L, 0L, 0L, 0L, 0L)) && r(5) == ((6L, 0L, 0L, 0L, 0L)),
      s"same-day peers are mutually invisible (RANGE to 1 PRECEDING): ${r(4)}, ${r(5)}")
  }

  test("real orders: row-complete, 90d frame nested in lifetime frame") {
    val f = Features.pointInTimeFeatures(spark, sf001).cache()
    val n = graft.Tables.orders(spark, sf001).count()
    assert(f.count() == n, "one feature row per order")
    assert(f.where(col("prior_n_90d") > col("prior_n_life")).count() == 0,
      "the 90d frame is a subset of the lifetime frame")
    assert(f.where(col("prior_cents_90d") > col("prior_cents_life")).count() == 0,
      "90d spend never exceeds lifetime spend (all cents non-negative)")
    // per customer, lifetime counts enumerate 0..n-1 in day order:
    // max prior_n_life = customer's order count - 1 (ties share a day
    // only if planted; real o_orderdate has duplicates, so assert <=)
    val bad = f.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"), max(col("prior_n_life")).as("m"))
      .where(col("m") >= col("n")).count()
    assert(bad == 0, "prior count is strictly less than the customer's total")
  }
}
