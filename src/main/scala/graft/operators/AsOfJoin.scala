package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) joins, composed from built-in operators —
  * preference (a) of the custom-operator ladder: no custom SparkPlan
  * needed because union + window expresses the semantics exactly.
  *
  * [[asof]]: for each left row, the LATEST right row of the same key
  * with `rightTime <= leftTime` (inclusive) — DuckDB `ASOF LEFT JOIN`
  * (the test oracle), kdb `aj`. [[asofForward]]: the EARLIEST right
  * row with `rightTime >= leftTime`, optionally bounded by a
  * tolerance — pandas `merge_asof(direction='forward', tolerance=…)`,
  * the shape a feature-store backfill needs so a "next event" can't
  * leak in from arbitrarily far ahead.
  *
  * Physical shape (both directions): one hash shuffle on the key +
  * one in-partition sort over (time, side-tag), then a running
  * `last(right_payload, ignoreNulls)` window — the textbook
  * distributed as-of algorithm. At 100 TB this is a single exchange
  * of each side, no n×m work, and the window never buffers more than
  * one right payload per row. Skewed keys (one user with millions of
  * events) salt-split cleanly because the window only needs per-key
  * time order within the salt if the right side is replicated per
  * salt. The forward tolerance is a map-side null-out after the
  * window — no extra shuffle.
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
      leftTime: String, rightTime: String, prefix: String = "asof_"): DataFrame =
    unionWindow(left, right, key, leftTime, rightTime, prefix,
      descending = false, toleranceMicros = None)

  /** Forward as-of: earliest right row at-or-after each left row; a
    * match further ahead than `toleranceMicros` is nulled out. Same
    * contract as [[asof]] otherwise (see object scaladoc).
    */
  def asofForward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, prefix: String = "asof_",
      toleranceMicros: Long = Long.MaxValue): DataFrame =
    unionWindow(left, right, key, leftTime, rightTime, prefix,
      descending = true, toleranceMicros = Some(toleranceMicros))

  /** Shared core: tag-union both sides, run the time-ordered window
    * (ascending = backward as-of, descending = forward), keep left
    * rows, unpack. Tag 0 sorts before tag 1 at equal times in either
    * direction, so a right row at t is visible to a left row at the
    * same t — the inclusive bound.
    */
  private def unionWindow(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, prefix: String,
      descending: Boolean, toleranceMicros: Option[Long]): DataFrame = {
    val lCols = left.columns.filter(_ != key).toSeq
    val rCols = right.columns.filter(_ != key).toSeq
    val lStruct = struct(lCols.map(col): _*)
    val rStruct = struct(rCols.map(col): _*)
    val lType = left.select(lStruct).schema.head.dataType
    val rType = right.select(rStruct).schema.head.dataType

    val l2 = left.select(col(key).as("_k"), col(leftTime).as("_t"),
      lit(1).as("_tag"), lStruct.as("_lp"), lit(null).cast(rType).as("_rp"))
    val r2 = right.select(col(key).as("_k"), col(rightTime).as("_t"),
      lit(0).as("_tag"), lit(null).cast(lType).as("_lp"), rStruct.as("_rp"))

    val w = Window.partitionBy(col("_k"))
      .orderBy(if (descending) col("_t").desc else col("_t").asc,
        col("_tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matchedRaw = last(col("_rp"), ignoreNulls = true).over(w)
    val us = (c: Column) => graft.Tables.epochMicros(c)
    val matched = toleranceMicros match {
      case None => matchedRaw
      case Some(tol) =>
        // NTZ-safe micros compare; NULL match falls through to null
        when(matchedRaw.isNotNull &&
            us(matchedRaw.getField(rightTime)) - us(col("_t")) <= tol,
          matchedRaw).otherwise(lit(null).cast(rType))
    }
    val joined = l2.unionByName(r2)
      .withColumn("_match_r", matched)
      .filter(col("_tag") === 1)

    val outLeft: Seq[Column] =
      col("_k").as(key) +: lCols.map(c => col("_lp").getField(c).as(c))
    val outRight: Seq[Column] =
      rCols.map(c => col("_match_r").getField(c).as(prefix + c))
    joined.select(outLeft ++ outRight: _*)
  }
}
