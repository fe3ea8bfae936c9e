package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed tables: pre-shuffled storage so co-located joins and
  * aggregations skip the exchange entirely — the 100 TB answer to
  * "this join shuffles both sides every query".
  */
class BucketingSpec extends SparkSpec {

  test("bucketed join plans without a shuffle exchange") {
    // default warehouse (./spark-warehouse, gitignored); static conf
    // can't be changed post-session. Clear leftovers from prior JVMs:
    // the fresh in-memory catalog doesn't know about old table dirs.
    Seq("orders_b", "lineitem_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        import scala.reflect.io.Directory
        new Directory(dir).deleteRecursively()
      }
    }
    val o = graft.Tables.orders(spark, sf001)
    val l = graft.Tables.lineitem(spark, sf001)
    o.write.mode("overwrite").bucketBy(4, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    l.withColumnRenamed("l_orderkey", "o_orderkey")
      .write.mode("overwrite").bucketBy(4, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("lineitem_b")

    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"), "o_orderkey")
      .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
    val plan = joined.queryExecution.executedPlan.toString

    // co-located: no ShuffleExchange anywhere below the join
    assert(!plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join should not shuffle on the join key:\n$plan")
    // and the result is still right
    val viaBuckets = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val plain = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaBuckets == plain)
  }
}
