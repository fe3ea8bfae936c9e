package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The composed training-data-prep pipeline — the end-to-end flow a
  * 100 TB corpus actually runs, as ONE declarative query:
  *
  *   scrub (URL/email/ws normalize)
  *     → quality gate (token count + punctuation ratio)
  *     → exact dedup (keep min-doc_id representative)
  *     → per-language token statistics of the surviving corpus
  *
  * Each stage is the already-tested operator from this module;
  * composing them stays a single Catalyst plan: one documents scan,
  * one dedup shuffle, one final agg. Nothing materializes between
  * stages — the optimizer fuses scrub+filter into the scan.
  */
object Pipeline {

  def trainingPrep(spark: SparkSession, sfDir: String): DataFrame = {
    val scrubbed = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        TextAnalysis.scrubCol(col("text")).as("clean"))
    val gated = scrubbed
      .withColumn("toks", filter(split(col("clean"), " "), w => length(w) > 0))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("n_punct",
        size(regexp_extract_all(col("clean"), lit("[^A-Za-z0-9\\s]"), lit(0))))
      .filter(col("n_tokens") >= 5
        && when(length(col("clean")) > 0,
          col("n_punct").cast("double") / length(col("clean"))) <= lit(0.2))
    // observe(): per-stage row counters surface in QueryExecution
    // metrics (SparkListener/observedMetrics) without extra actions —
    // free pipeline observability at any scale
    val deduped = gated
      .observe("gated", count(lit(1)).as("rows_after_gate"))
      .withColumn("h", md5(lower(col("clean"))))
      .withColumn("keep",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("h")).orderBy(col("doc_id").asc)) === 1)
      .filter(col("keep"))
    deduped
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        (sum(col("n_tokens")).cast("double") / count(lit(1))).as("avg_tokens"),
        min(col("doc_id")).as("first_doc"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_llm_pipeline" -> trainingPrep _,
  )

  val oracles: Map[String, String] = Map(
    "q_llm_pipeline" ->
      s"""WITH scrubbed AS (
        |  SELECT doc_id, lang, ${TextAnalysis.sqlScrub("text")} AS clean
        |  FROM documents),
        |gated AS (
        |  SELECT doc_id, lang, clean,
        |    len(list_filter(string_split(clean, ' '), w -> length(w) > 0)) AS n_tokens
        |  FROM scrubbed
        |  WHERE len(list_filter(string_split(clean, ' '), w -> length(w) > 0)) >= 5
        |    AND CASE WHEN length(clean) > 0 THEN
        |          CAST(len(regexp_extract_all(clean, '[^A-Za-z0-9\\s]')) AS DOUBLE)
        |          / length(clean) END <= 0.2),
        |deduped AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY md5(lower(clean)) ORDER BY doc_id ASC) AS rn
        |    FROM gated)
        |  WHERE rn = 1)
        |SELECT lang, count(*) AS n_docs,
        |  sum(n_tokens) AS total_tokens,
        |  CAST(sum(n_tokens) AS DOUBLE) / count(*) AS avg_tokens,
        |  min(doc_id) AS first_doc
        |FROM deduped GROUP BY lang""".stripMargin,
  )
}
