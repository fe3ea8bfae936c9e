package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Timing probe behind BASELINE.md's round-12 approx_stats entry:
  * times the combined multi-aggregate (the REJECTED Expand-percentile
  * trap — a sketch buffer per (flag, partkey) group), each aggregate
  * separately, and the shipped two-pass split, on any sfDir.
  * Usage: ApproxProbe <sfDir>
  */
object ApproxProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rsd = 0.05
    val acc = 10000L
    val li = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_partkey"), col("l_extendedprice"))
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(s"[probe] $tag: ${(System.nanoTime() - t0) / 1e9} s"); r
    }
    // warmup scan
    t("warmup count")(li.count())
    val agg = li.groupBy(col("l_returnflag")).agg(
      countDistinct(col("l_partkey")).as("n_parts"),
      approx_count_distinct(col("l_partkey"), rsd).as("_hll"),
      expr(s"approx_percentile(l_extendedprice, 0.5, $acc)").as("_amed"),
      count(lit(1)).as("n"))
    val rows = t("pass1 collect")(agg.collect())
    val aggLocal = spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(rows: _*)), agg.schema)
    val rank = li
      .join(broadcast(aggLocal.select(col("l_returnflag").as("_rf"), col("_amed"))),
        col("l_returnflag") === col("_rf"))
      .groupBy(col("_rf"))
      .agg(
        sum(when(col("l_extendedprice") <= col("_amed"), 1L).otherwise(0L)).as("_le"),
        sum(when(col("l_extendedprice") < col("_amed"), 1L).otherwise(0L)).as("_lt"))
    t("pass2 rank")(rank.collect())
    // candidate 2-pass split: sketches (no distinct, one buffer per
    // flag) then exact-distinct + rank sums (Expand but long buffers)
    val s1 = t("sketches by flag")(li.groupBy(col("l_returnflag")).agg(
      approx_count_distinct(col("l_partkey"), rsd).as("_hll"),
      expr(s"approx_percentile(l_extendedprice, 0.5, $acc)").as("_amed"),
      count(lit(1)).as("n")).collect())
    val med = spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(s1: _*)),
      li.groupBy(col("l_returnflag")).agg(
        approx_count_distinct(col("l_partkey"), rsd).as("_hll"),
        expr(s"approx_percentile(l_extendedprice, 0.5, $acc)").as("_amed"),
        count(lit(1)).as("n")).schema)
      .select(col("l_returnflag").as("_rf"), col("_amed"))
    t("exact distinct + rank sums")(li
      .join(broadcast(med), col("l_returnflag") === col("_rf"))
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        sum(when(col("l_extendedprice") <= col("_amed"), 1L).otherwise(0L)).as("_le"),
        sum(when(col("l_extendedprice") < col("_amed"), 1L).otherwise(0L)).as("_lt"))
      .collect())
    t("two-level exact distinct + rank sums")(li
      .join(broadcast(med), col("l_returnflag") === col("_rf"))
      .groupBy(col("l_returnflag"), col("l_partkey"))
      .agg(
        sum(when(col("l_extendedprice") <= col("_amed"), 1L).otherwise(0L)).as("le1"),
        sum(when(col("l_extendedprice") < col("_amed"), 1L).otherwise(0L)).as("lt1"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("le1")).as("_le"), sum(col("lt1")).as("_lt"))
      .collect())
    spark.stop()
  }
}
