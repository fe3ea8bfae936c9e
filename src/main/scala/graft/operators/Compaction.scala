package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-log compaction: collapse an append-only event/CDC log to
  * the latest record per key.
  *
  * This is the batch half of every incremental pipeline at 100 TB:
  * upserts arrive as appended rows, and consumers want current state.
  * The shape is ONE shuffle on the key, and Spark's WindowGroupLimit
  * pushes the `row_number() = 1` limit into both the partial
  * (map-side) and final window sort, so each task forwards at most
  * one row per key instead of sorting and emitting whole groups —
  * the same partial-aggregation shape a map-side combine gives
  * `reduceByKey` (reference analogue: the reference always reduces
  * ALL values of a key, `worker.go:153-169`; compaction is the
  * "reduce = keep last" special case made first-class).
  *
  * Ties on the ordering column must be broken deterministically —
  * `orderBy` here takes the FULL ordering including a unique
  * tiebreak, else two engines (or two runs) may pick different
  * rows of a tied group.
  */
object Compaction {

  /** Latest row per key group: total-ordered by `ordering` descending
    * (last element is the most significant tiebreak).
    */
  def latestPerKey(df: DataFrame, keys: Seq[String],
      ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ordering.map(_.desc): _*)
    df.withColumn("graft_rn", row_number().over(w))
      .filter(col("graft_rn") === 1)
      .drop("graft_rn")
  }

  /** Upsert-merge: apply a batch of updates to a base snapshot, key
    * by key, newest `ordering` wins (updates beat base on exact
    * ties via the `is_update` bit). Union-then-compact is the
    * scale-correct plan: one shuffle over base+updates, no
    * driver-side diffing, and the union scan stays partition-parallel
    * over both inputs.
    */
  def upsertMerge(base: DataFrame, updates: DataFrame, keys: Seq[String],
      ordering: Seq[Column]): DataFrame = {
    val b = base.withColumn("graft_upd", lit(0))
    val u = updates.withColumn("graft_upd", lit(1))
    latestPerKey(b.unionByName(u), keys, ordering :+ col("graft_upd"))
      .drop("graft_upd")
  }
}
