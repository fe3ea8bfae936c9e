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

  /** Curriculum bucketing: split the corpus into quality quartiles
    * (histogram-equalized — each bucket gets ~25% of the docs no
    * matter how skewed the score distribution), then order
    * pseudorandomly WITHIN each bucket, so a trainer can feed
    * easy/clean buckets first and ramp.
    *
    * Scale shape: the only global computation is one exact
    * interpolated-percentile aggregate (3 doubles to the driver);
    * bucketing is then a broadcast of those 3 thresholds into a
    * map-only CASE, and the per-bucket (hash, doc_id) row_number
    * windows run in parallel across buckets. No global sort, no
    * single-task ntile window — the classic curriculum trap at
    * corpus scale.
    *
    * Null quality (empty docs) coalesces to 0.0 → bucket 1; bucket 4
    * is the highest-quality quartile. Ties AT a threshold land in the
    * lower bucket on both engines (identical doubles, `<=` on both
    * sides).
    */
  def curriculum(spark: SparkSession, sfDir: String): DataFrame = {
    // staged: the scored frame feeds BOTH the threshold aggregate and
    // the bucketing tail — unstaged, the regex-heavy quality pipeline
    // runs twice over the corpus (the q_skyline lesson; the staged
    // frame is two columns, a bounded fraction of the text it scores)
    val q = graft.Materialize.stage(
      TextAnalysis.qualityScore(spark, sfDir)
        .select(col("doc_id"), coalesce(col("quality"), lit(0.0)).as("q")),
      eager = false)
    val thresholds = q.agg(
      expr("percentile(q, array(0.25, 0.5, 0.75))").as("ts"))
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col("_ok").asc, col("doc_id").asc)
    q.crossJoin(broadcast(thresholds))
      .withColumn("bucket",
        when(col("q") <= col("ts").getItem(0), 1L)
          .when(col("q") <= col("ts").getItem(1), 2L)
          .when(col("q") <= col("ts").getItem(2), 3L)
          .otherwise(4L))
      .withColumn("_ok",
        PortableHash.h60(col("doc_id").cast("string"), lit("curriculum")))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("q"), col("bucket"), col("pos"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_llm_shuffle" -> shuffleDocs _,
    "q_llm_curriculum" -> curriculum _,
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
    "q_llm_curriculum" ->
      s"""WITH qual AS (
         |  SELECT doc_id, COALESCE(quality, 0.0) AS q
         |  FROM (${TextAnalysis.sqlQualityTable})),
         |ts AS (
         |  SELECT quantile_cont(q, [0.25, 0.5, 0.75]) AS t FROM qual),
         |b AS (
         |  SELECT doc_id, q,
         |    CASE WHEN q <= t[1] THEN 1 WHEN q <= t[2] THEN 2
         |         WHEN q <= t[3] THEN 3 ELSE 4 END AS bucket,
         |    ${PortableHash.sqlH60("CAST(doc_id AS VARCHAR) || '#' || 'curriculum'")} AS ok
         |  FROM qual, ts)
         |SELECT doc_id, q, CAST(bucket AS BIGINT) AS bucket,
         |  row_number() OVER (PARTITION BY bucket
         |                     ORDER BY ok ASC, doc_id ASC) AS pos
         |FROM b""".stripMargin,
  )
}
