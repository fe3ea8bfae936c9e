package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join, composed from built-in operators —
  * preference (a) of the custom-operator ladder: no custom SparkPlan
  * needed because union + window expresses the semantics exactly.
  *
  * For each left row, attaches the LATEST right row of the same key
  * with `rightTime <= leftTime` (inclusive), or nulls if none — the
  * semantics of DuckDB's `ASOF LEFT JOIN` (which serves as the test
  * oracle) and of kdb's `aj`.
  *
  * Physical shape: one hash shuffle on the key + one in-partition
  * sort over (time, side-tag), then a running `last(right_payload,
  * ignoreNulls)` window — the textbook distributed as-of algorithm.
  * At 100 TB this is a single exchange of each side, no n×m work,
  * and the window never buffers more than one right payload per row.
  * Skewed keys (one user with millions of events) salt-split cleanly
  * because the window only needs per-key time order within the salt
  * if the right side is replicated per salt.
  */
object AsOfJoin {

  /** @param left      probe side (each row appears exactly once in output)
    * @param right     reference side. If it can contain multiple rows
    *                  with the same (key, time), pre-aggregate to one
    *                  row per instant — otherwise which of the tied
    *                  rows wins is not defined (same caveat as any
    *                  ASOF implementation, incl. DuckDB's)
    * @param key       equi-join key column name (present in both)
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param prefix    prefix for right-side columns in the output
    */
  def asof(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, prefix: String = "asof_"): DataFrame = {
    val lCols = left.columns.filter(_ != key).toSeq
    val rCols = right.columns.filter(_ != key).toSeq
    val lStruct = struct(lCols.map(col): _*)
    val rStruct = struct(rCols.map(col): _*)
    val lType = left.select(lStruct).schema.head.dataType
    val rType = right.select(rStruct).schema.head.dataType

    // tag 0 sorts before tag 1 at equal times -> right row at t is
    // visible to a left row at the same t (inclusive >=)
    val l2 = left.select(col(key).as("_k"), col(leftTime).as("_t"),
      lit(1).as("_tag"), lStruct.as("_lp"), lit(null).cast(rType).as("_rp"))
    val r2 = right.select(col(key).as("_k"), col(rightTime).as("_t"),
      lit(0).as("_tag"), lit(null).cast(lType).as("_lp"), rStruct.as("_rp"))

    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val joined = l2.unionByName(r2)
      .withColumn("_last_r", last(col("_rp"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)

    val outLeft: Seq[Column] =
      col("_k").as(key) +: lCols.map(c => col("_lp").getField(c).as(c))
    val outRight: Seq[Column] =
      rCols.map(c => col("_last_r").getField(c).as(prefix + c))
    joined.select(outLeft ++ outRight: _*)
  }

  /** Forward as-of: for each left row, the EARLIEST right row of the
    * same key with `rightTime >= leftTime` (inclusive), or nulls —
    * kdb's reverse `aj`, DuckDB `ASOF LEFT JOIN ... ON l.t <= r.t`.
    * Optional tolerance: a match further than `toleranceMicros` ahead
    * is discarded (nulls), the `merge_asof(..., tolerance=...)`
    * semantics a feature-store backfill needs so a "next event"
    * can't leak in from arbitrarily far in the future.
    *
    * Physical shape is the mirror of [[asof]]: same single hash
    * exchange per side, the in-partition sort runs time-DESCENDING so
    * the running `last(right, ignoreNulls)` carries the nearest
    * FOLLOWING right row. Tolerance is a map-side null-out after the
    * window — no extra shuffle.
    */
  def asofForward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, prefix: String = "asof_",
      toleranceMicros: Long = Long.MaxValue): DataFrame = {
    val lCols = left.columns.filter(_ != key).toSeq
    val rCols = right.columns.filter(_ != key).toSeq
    val lStruct = struct(lCols.map(col): _*)
    val rStruct = struct(rCols.map(col): _*)
    val lType = left.select(lStruct).schema.head.dataType
    val rType = right.select(rStruct).schema.head.dataType

    // descending traversal; tag 0 still sorts first at equal times ->
    // a right row at t is visible to a left row at the same t
    val l2 = left.select(col(key).as("_k"), col(leftTime).as("_t"),
      lit(1).as("_tag"), lStruct.as("_lp"), lit(null).cast(rType).as("_rp"))
    val r2 = right.select(col(key).as("_k"), col(rightTime).as("_t"),
      lit(0).as("_tag"), lit(null).cast(lType).as("_lp"), rStruct.as("_rp"))

    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t").desc, col("_tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val us = (c: Column) => graft.Tables.epochMicros(c)
    val matchedRaw = last(col("_rp"), ignoreNulls = true).over(w)
    val joined = l2.unionByName(r2)
      .withColumn("_next_raw", matchedRaw)
      .filter(col("_tag") === 1)
      // null-out beyond-tolerance matches (NTZ-safe micros compare)
      .withColumn("_next_r",
        when(col("_next_raw").isNotNull &&
            us(col("_next_raw").getField(rightTime)) - us(col("_t"))
              <= toleranceMicros,
          col("_next_raw")).otherwise(lit(null).cast(rType)))

    val outLeft: Seq[Column] =
      col("_k").as(key) +: lCols.map(c => col("_lp").getField(c).as(c))
    val outRight: Seq[Column] =
      rCols.map(c => col("_next_r").getField(c).as(prefix + c))
    joined.select(outLeft ++ outRight: _*)
  }
}
