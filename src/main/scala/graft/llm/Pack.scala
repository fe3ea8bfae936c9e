package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Sequence packing for training batches — the concat-and-chunk
  * scheme GPT-style pretraining uses: documents in a fixed order form
  * one virtual token stream that is cut into `budget`-token context
  * windows ("packs"); a document belongs to the pack where it STARTS
  * (straddling the boundary is allowed, exactly like a sample
  * straddling two context windows).
  *
  * The hard part at scale is the global running token count. A global
  * window (`Window.orderBy` with no partition) funnels 100 TB through
  * ONE task; instead [[exclusivePrefixSum]] runs a TWO-LEVEL
  * distributed prefix sum, made deterministic by partitioning on
  * arithmetic ranges of the order key (`key div binWidth`) rather
  * than `repartitionByRange`, whose sampled boundaries can differ
  * between the partials pass and the final pass (two actions = two
  * RDD ids = two sample seeds).
  *
  * Levels: bin partials (one per `binWidth` keys) stay DISTRIBUTED
  * and are prefix-summed with a window partitioned by super-bin;
  * only the super-bin partials (one per `binWidth²` keys) reach the
  * driver for the exclusive scan. Movement: one hash shuffle of the
  * rows, a tiny shuffle of the bin partials, and a driver collect of
  * n/binWidth² offsets — at 10¹⁰ rows with binWidth 1000 that is
  * 10⁴ longs on the driver where the one-level scheme held 10⁷.
  */
object Pack {

  /** Rows of the most recent level-2 driver collect — the
    * observability hook PackSpec uses to assert the collect is
    * O(n/binWidth²), not O(n/binWidth). Test-facing only.
    */
  @volatile private[graft] var lastDriverCollect: Int = -1

  /** Global exclusive running sum of `valueCol` in `orderCol` order
    * (first row gets 0), without a global window.
    *
    * @param orderCol non-negative integral column, UNIQUE per row —
    *                 ties would make the running sum order-dependent
    * @param binWidth order-key range per level-1 bin; the driver
    *                 holds one offset per binWidth² keys
    */
  def exclusivePrefixSum(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val spark = df.sparkSession
    import spark.implicits._
    val binned = df.withColumn("_bin", expr(s"$orderCol div $binWidth"))
    // level-1 partials: distributed, staged because both the level-2
    // collect and the bin-offset window read them
    val partials = graft.Materialize.stage(
      binned.groupBy(col("_bin"))
        .agg(sum(col(valueCol).cast("long")).as("_s"))
        .withColumn("_sbin", expr(s"_bin div $binWidth")),
      eager = false)
    // level-2: the ONLY driver collect — one partial per binWidth² keys
    val superPartials = partials.groupBy(col("_sbin"))
      .agg(sum(col("_s")).as("_ss"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    lastDriverCollect = superPartials.length
    val superOffsets = superPartials.map(_._1)
      .zip(superPartials.map(_._2).scanLeft(0L)(_ + _)).toSeq
    val soffDf = superOffsets.toDF("_sbin", "_soff")
    // exclusive bin offsets: within-super-bin window + super offset
    val wBin = Window.partitionBy(col("_sbin")).orderBy(col("_bin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val binOffsets = partials.join(broadcast(soffDf), "_sbin")
      .withColumn("_off", coalesce(sum(col("_s")).over(wBin), lit(0L)) + col("_soff"))
      .select(col("_bin"), col("_off"))
    // NOT broadcast: binOffsets is O(n/binWidth) rows — the join
    // shuffles on _bin, and the window below reuses that partitioning
    val w = Window.partitionBy(col("_bin")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    binned.join(binOffsets, "_bin")
      .withColumn(outCol,
        coalesce(sum(col(valueCol).cast("long")).over(w), lit(0L)) + col("_off"))
      .drop("_bin", "_off")
  }

  /** Tokens per context window for the registered packing query. */
  val DefaultBudget = 2048L

  /** Per-document pack assignment over the documents table: doc_id
    * order, whitespace tokens (the shared [[TextAnalysis.tokensCol]]
    * tokenizer), pack = start-offset div budget.
    */
  def packAssignments(spark: SparkSession, sfDir: String,
      budget: Long = DefaultBudget): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(TextAnalysis.tokensCol).cast("long").as("n_tokens"))
    exclusivePrefixSum(docs, "doc_id", "n_tokens", "start_tok", 1000L)
      .withColumn("pack_id", expr(s"start_tok div $budget"))
  }

  /** Pack-level stats: how full each context window is and which doc
    * range feeds it — the operational readout for choosing a budget
    * (packs much smaller than `budget` mean wasted context; the last
    * pack is legitimately short).
    */
  def packStats(spark: SparkSession, sfDir: String): DataFrame =
    packAssignments(spark, sfDir)
      .groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("pack_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))

  /** Packing-efficiency probe — the budget-sizing readout in the
    * same spirit as the dedup band/containment sizing probes: the
    * distribution of pack fill as integer deciles of `budget`
    * (decile 10 = exactly full; >10 = a straddling document pushed
    * the pack past the budget, which concat-and-chunk allows). Lots
    * of mass below decile 8 says the budget is too large for the
    * document length mix; mass far above 10 says long documents
    * dominate and a split-long-docs pass should precede packing.
    * One extra agg over the pack frame — the probe costs one
    * aggregation, not a second prefix sum.
    */
  def packFillHistogram(spark: SparkSession, sfDir: String): DataFrame =
    packAssignments(spark, sfDir)
      .groupBy(col("pack_id"))
      .agg(sum(col("n_tokens")).as("pack_tokens"))
      .groupBy(expr(s"pack_tokens * 10 div $DefaultBudget").as("fill_decile"))
      .agg(count(lit(1)).as("n_packs"),
        min(col("pack_tokens")).as("min_tokens"),
        max(col("pack_tokens")).as("max_tokens"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_llm_pack" -> packStats _,
    "q_llm_pack_stats" -> packFillHistogram _,
  )

  val oracles: Map[String, String] = Map(
    "q_llm_pack" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CAST(len(${TextAnalysis.sqlTokens}) AS BIGINT) AS n_tokens
         |  FROM documents),
         |s AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS start_tok
         |  FROM t)
         |SELECT start_tok // $DefaultBudget AS pack_id,
         |  count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
         |  min(doc_id) AS first_doc,
         |  max(doc_id) AS last_doc
         |FROM s GROUP BY 1""".stripMargin,
    "q_llm_pack_stats" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CAST(len(${TextAnalysis.sqlTokens}) AS BIGINT) AS n_tokens
         |  FROM documents),
         |s AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS start_tok
         |  FROM t),
         |p AS (
         |  SELECT start_tok // $DefaultBudget AS pack_id,
         |    CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
         |  FROM s GROUP BY 1)
         |SELECT pack_tokens * 10 // $DefaultBudget AS fill_decile,
         |  count(*) AS n_packs,
         |  min(pack_tokens) AS min_tokens,
         |  max(pack_tokens) AS max_tokens
         |FROM p GROUP BY 1""".stripMargin,
  )
}
