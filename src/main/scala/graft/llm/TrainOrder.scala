package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic global shuffle for training-data order.
  *
  * Pretraining wants documents in a pseudorandom order that is (a)
  * reproducible across reruns and engines, (b) computable without a
  * global sort through one task, and (c) addressable — "give me shard
  * 17 of 1024 in epoch 3" must be a cheap selective read, not a
  * re-shuffle. All three fall out of hashing, not randomness: the
  * order key is the portable 60-bit md5 hash of the doc id salted
  * with the epoch seed ([[PortableHash.h60]]), the shard is that key
  * mod the shard count, and the position within a shard is a
  * row_number over the shard's own window — each shard sorts
  * independently in parallel, so the only global operation is the
  * hash partition on `shard`. A new seed reshuffles everything with
  * zero state; the same seed replays bit-for-bit.
  */
object TrainOrder {

  /** Assign (shard, pos) to every row of `df` for one epoch.
    *
    * @param idCol   unique row id (becomes the hash input)
    * @param seed    epoch seed; change it to re-deal the corpus
    * @param nShards training shard count — sized so one shard is one
    *                reader task's worth of data (thousands at 100 TB)
    */
  def shuffled(df: DataFrame, idCol: String, seed: String,
      nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val key = PortableHash.h60(col(idCol).cast("string"), lit(seed))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("_ok").asc, col(idCol).asc)
    df.withColumn("_ok", key)
      .withColumn("shard", col("_ok") % nShards)
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("_ok")
  }

  /** Registered query: epoch-42 shuffle of the documents table into 8
    * shards; output is the full addressable order (doc_id → shard,
    * pos). The md5 order key makes DuckDB reproduce it exactly.
    */
  def shuffleDocs(spark: SparkSession, sfDir: String): DataFrame =
    shuffled(Tables.documents(spark, sfDir).select(col("doc_id")),
      "doc_id", "epoch42", 8)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_llm_shuffle" -> shuffleDocs _,
  )

  val oracles: Map[String, String] = Map(
    "q_llm_shuffle" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |    ${PortableHash.sqlH60("CAST(doc_id AS VARCHAR) || '#' || 'epoch42'")} AS ok
         |  FROM documents)
         |SELECT doc_id, ok % 8 AS shard,
         |  row_number() OVER (PARTITION BY ok % 8
         |                     ORDER BY ok ASC, doc_id ASC) AS pos
         |FROM h""".stripMargin,
  )
}
