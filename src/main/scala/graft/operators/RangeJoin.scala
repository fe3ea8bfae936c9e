package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join via bin bucketing — preference (a) of
  * the custom-operator ladder: composition turns an inequality join
  * Catalyst can only run as BroadcastNestedLoopJoin into a plain
  * equi-join plus a residual filter.
  *
  * Each interval `[lo, hi]` is exploded to the fixed-width bins it
  * overlaps (`sequence(lo div w, hi div w)`); each point lands in
  * exactly ONE bin (`p div w`), so the equi-join on (key, bin) finds
  * every containing interval exactly once — no `distinct` needed, the
  * classic dedup trap of bin-bucketed joins. The residual
  * `lo <= p <= hi` filter removes same-bin near-misses.
  *
  * Scale shape: one hash shuffle of each side on (key, bin) — a
  * SortMergeJoin at 100 TB, never n×m work. Choose `binWidth` ≈ the
  * max interval length so each interval replicates into ≤ 2 bins
  * (replication factor = len/width + 1). Skew concentrates where many
  * intervals overlap one (key, bin) cell — the same salting dial as
  * any equi-join ([[Skew]]) applies because the join IS an equi-join.
  */
object RangeJoin {

  /** @param points    side with a scalar column; each output row pairs
    *                  one point row with one containing interval row
    * @param intervals side with `[loCol, hiCol]` bounds (inclusive
    *                  both ends, mirroring SQL BETWEEN)
    * @param key       equi-join key present on both sides
    * @param pointCol  integral point column on `points`
    * @param loCol     integral lower bound on `intervals`
    * @param hiCol     integral upper bound on `intervals`
    * @param binWidth  bin size in the point column's units; all other
    *                  column names must be disjoint across the sides
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame, key: String,
      pointCol: String, loCol: String, hiCol: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val binned = intervals.withColumn("_bin",
      explode(sequence(expr(s"$loCol div $binWidth"), expr(s"$hiCol div $binWidth"))))
    points.withColumn("_bin", expr(s"$pointCol div $binWidth"))
      .join(binned, Seq(key, "_bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_bin")
  }
}
