package graft.queries

import graft.SparkSpec

class StarSchemaSpec extends SparkSpec {

  test("approx sketches land inside their published error bounds") {
    val rows = StarSchema.approxStats(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flag = r.getString(0)
      assert(r.getBoolean(3), s"$flag: HLL estimate outside 3*rsd of exact")
      assert(r.getBoolean(4), s"$flag: approx median rank outside 1/accuracy bound")
    }
    // the exact columns still agree with the independent exact query
    val exact = StarSchema.aggStats(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap // n_parts
    rows.foreach(r => assert(r.getLong(1) == exact(r.getString(0))))
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
