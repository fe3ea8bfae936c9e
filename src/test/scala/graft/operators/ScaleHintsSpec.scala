package graft.operators

import graft.SparkSpec

/** The scale-conditional shuffled-hash hints: below the byte
  * threshold Catalyst's default join choice stands (the r11 pins'
  * measured 1.45–1.64× sf0.1 tax removed); at/above it the build
  * side carries the hint (the ×1000 tail fix preserved —
  * PlanAuditSpec pins that regime for all eight queries via
  * threshold 0). Values are dial-independent: the oracle gate runs
  * at the default.
  */
class ScaleHintsSpec extends SparkSpec {

  test("srcBytes is a file-metadata read matching the dir's real size") {
    val b = ScaleHints.srcBytes(spark, s"$sf001/lineitem.parquet")
    // the driver ships each table as ONE parquet file; hadoop
    // listStatus on a plain file returns that file's status
    val f = new java.io.File(s"$sf001/lineitem.parquet")
    val expected =
      if (f.isFile) f.length
      else f.listFiles().filter(_.isFile).map(_.length).sum
    assert(b == expected && b > 0)
    assert(ScaleHints.srcBytes(spark, "/no/such/dir") == 0L)
  }

  test("below the threshold the fact join is NOT hint-pinned (SMJ or broadcast ok)") {
    // sf0.001's lineitem is ~100 KB — far under 256 MiB, so the plan
    // must be whatever Catalyst picks unhinted; assert the hint's
    // signature (ShuffledHashJoin) is absent for a query that pins it
    // at big-fact scale, proving the conditional actually conditions
    spark.sharedState.cacheManager.clearCache()
    val p = graft.SparkEntry.queries("q5_local_supplier")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("ShuffledHashJoin"),
      s"small-scale plan should not carry the shuffle_hash pin:\n$p")
  }

  test("threshold 0 forces the hint; values identical either way") {
    val dial = graft.SparkEntry.queries("q5_local_supplier")
    spark.sharedState.cacheManager.clearCache()
    val unhinted = dial(spark, sf001).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    spark.conf.set(ScaleHints.ShjFactMinBytesConf, "0")
    val hinted =
      try {
        val p = dial(spark, sf001)
        assert(p.queryExecution.executedPlan.toString.contains("ShuffledHashJoin"))
        p.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      } finally spark.conf.unset(ScaleHints.ShjFactMinBytesConf)
    assert(hinted == unhinted)
  }
}
