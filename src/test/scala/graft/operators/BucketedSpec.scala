package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BucketedSpec extends SparkSpec {

  private lazy val written: Unit = {
    Bucketed.write(spark, Tables.orders(spark, sf001)
        .select(col("o_orderkey"), col("o_orderpriority")),
      "spec_orders_bkt", "o_orderkey", 4, sf001)
    Bucketed.write(spark, Tables.lineitem(spark, sf001)
        .select(col("l_orderkey"), col("l_quantity")),
      "spec_lineitem_bkt", "l_orderkey", 4, sf001)
  }

  private def joined = {
    written
    Bucketed.colocatedJoin(spark, "spec_lineitem_bkt", "spec_orders_bkt",
      "l_orderkey", "o_orderkey")
  }

  test("co-located join plans with zero Exchange") {
    val phys = joined.queryExecution.executedPlan.toString
    assert(!phys.contains("Exchange"), s"unexpected shuffle in:\n$phys")
    assert(phys.contains("SortMergeJoin"))
    assert(phys.contains("Bucketed: true"))
  }

  test("bucketing changes the plan, not the values") {
    val expected = Tables.lineitem(spark, sf001)
      .select(col("l_orderkey"), col("l_quantity"))
      .join(Tables.orders(spark, sf001)
          .select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(
        sum(col("l_quantity").cast("long")).as("q"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val got = joined
      .groupBy(col("o_orderpriority")).agg(
        sum(col("l_quantity").cast("long")).as("q"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("bucket count is data-sized: 256 MB/bucket, power of two in [8, 256]") {
    val MB = 1024L * 1024
    val cases = Seq(0L -> 8, 100 * MB -> 8, 2048 * MB -> 8,
      2304 * MB - 1 -> 16, // ceiling: just under a 256 MB multiple still rounds up
      2304 * MB -> 16, 4096 * MB -> 16, 10L * 1024 * MB -> 64,
      100L * 1024 * MB -> 256, Long.MaxValue -> 256)
    cases.foreach { case (bytes, want) =>
      assert(Bucketed.bucketCountForBytes(bytes) == want,
        s"bucketCountForBytes($bytes) = ${Bucketed.bucketCountForBytes(bytes)}, want $want")
    }
    // plan-time sizing needs no action and lands in the clamp floor
    // at spec scale
    assert(Bucketed.bucketCountFor(
      Tables.lineitem(spark, sf001).select(col("l_orderkey"))) == 8)
  }

  test("same-fingerprint write is a no-op (steady-state skip)") {
    written
    val full = Tables.orders(spark, sf001).count()
    // a 1-row df with the SAME fingerprint must be ignored
    Bucketed.write(spark, Tables.orders(spark, sf001)
        .select(col("o_orderkey"), col("o_orderpriority")).limit(1),
      "spec_orders_bkt", "o_orderkey", 4, sf001)
    assert(spark.table("spec_orders_bkt").count() == full)
  }

  test("JVM restart: matching on-disk marker re-registers without a render") {
    written
    // simulate a restart: the in-memory catalog forgets the table but
    // the rendered files + _GRAFT_SRC marker survive in the warehouse.
    // DROP on the managed table would delete the files, so stash a
    // copy first and restore it after the drop.
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val loc = new org.apache.hadoop.fs.Path(warehouse, "spec_orders_bkt")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stash = new org.apache.hadoop.fs.Path(loc.toString + ".stash")
    fs.delete(stash, true)
    org.apache.hadoop.fs.FileUtil.copy(fs, loc, fs, stash, false, true,
      spark.sparkContext.hadoopConfiguration)
    spark.sql("DROP TABLE spec_orders_bkt")
    assert(!spark.catalog.tableExists("spec_orders_bkt"))
    fs.rename(stash, loc)
    val partsBefore = fs.listStatus(loc)
      .filter(_.getPath.getName.startsWith("part-"))
      .map(s => (s.getPath.getName, s.getModificationTime)).toSet
    // a 1-row df proves no render happened: the re-registered table
    // must still hold the FULL original rows from the surviving files
    Bucketed.write(spark, Tables.orders(spark, sf001)
        .select(col("o_orderkey"), col("o_orderpriority")).limit(1),
      "spec_orders_bkt", "o_orderkey", 4, sf001)
    assert(spark.table("spec_orders_bkt").count() ==
      Tables.orders(spark, sf001).count())
    val partsAfter = fs.listStatus(loc)
      .filter(_.getPath.getName.startsWith("part-"))
      .map(s => (s.getPath.getName, s.getModificationTime)).toSet
    assert(partsAfter == partsBefore, "bucket files were rewritten")
    // and the re-registered table still satisfies the join's
    // distribution requirement shuffle-free
    val phys = joined.queryExecution.executedPlan.toString
    assert(!phys.contains("Exchange"), s"unexpected shuffle in:\n$phys")
  }

  test("a changed fingerprint forces the rewrite (overwrite path)") {
    written
    Bucketed.write(spark, Tables.orders(spark, sf001)
        .select(col("o_orderkey"), col("o_orderpriority")).limit(7),
      "spec_orders_bkt", "o_orderkey", 4, sf001 + "#v2")
    assert(spark.table("spec_orders_bkt").count() == 7)
    // restore for other tests in this suite (order-independent)
    Bucketed.write(spark, Tables.orders(spark, sf001)
        .select(col("o_orderkey"), col("o_orderpriority")),
      "spec_orders_bkt", "o_orderkey", 4, sf001)
    assert(spark.table("spec_orders_bkt").count() ==
      Tables.orders(spark, sf001).count())
  }
}
