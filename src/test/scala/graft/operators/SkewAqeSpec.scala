package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The runtime half of the skew story: [[Skew]] salts aggregations
  * explicitly; for JOINS the engine's own AQE re-plan
  * (`spark.sql.adaptive.skewJoin`) splits an oversized shuffle
  * partition into parallel chunks at runtime — no salting code, and
  * row-identical output. This exercises it live on a planted
  * power-law key and asserts BOTH the re-plan and the values.
  */
class SkewAqeSpec extends SparkSpec {

  test("AQE splits the hot key's partition; join output is unchanged") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // thresholds scaled down so a local corpus triggers the same
      // re-plan a multi-GB hot key would on a cluster
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val hot = spark.range(200000).select(lit(0L).as("k"), col("id").as("v"))
      val cold = spark.range(1000).select((col("id") + 1).as("k"), col("id").as("v"))
      val big = hot.unionAll(cold)
      val dim = spark.range(1001).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = big.join(dim, "k")
      // collect() executes THIS DataFrame's queryExecution (count()
      // would plan a separate one), so the AQE final plan is visible
      assert(joined.collect().length == 201000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("skew"),
        s"expected a skew-split join in the final adaptive plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
