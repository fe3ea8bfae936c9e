package graft.queries

import graft.SparkSpec

class StarSchemaSpec extends SparkSpec {

  test("approx sketches land near the exact answers") {
    val approx = StarSchema.approxStats(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = StarSchema.aggStats(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap  // n_parts
    val exactMedian = StarSchema.priceQuantiles(spark, sf001)  // orders, not comparable
    approx.foreach { case (flag, (apxParts, apxMed)) =>
      val exParts = exact(flag)
      assert(math.abs(apxParts - exParts).toDouble / exParts < 0.1,
        s"$flag: approx_count_distinct $apxParts vs exact $exParts")
      assert(apxMed > 0.0)
    }
  }

  test("pivot row/column totals agree with the histogram") {
    val pivot = StarSchema.pivotStatus(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1) + r.getLong(2) + r.getLong(3))).toMap
    val hist = StarSchema.priorityHistogram(spark, sf001).collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(pivot == hist)
  }
}
