package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Materialize, Tables}

/** Corpus-level n-gram language-model signals — the no-neural-LM
  * stand-ins a training-data pipeline uses for perplexity-style
  * filtering and phrase mining.
  *
  * Both queries follow the exact-integer discipline of
  * [[TextAnalysis.commonness]]: every aggregate is a BIGINT count or
  * a BIGINT mass sum, and the only floating-point op is ONE terminal
  * IEEE division of two exact integers — bitwise-identical in any
  * engine and under any partitioning. (A per-row `sum(p(w2|w1))`
  * double would depend on partition order; a log-prob sum would
  * depend on libm. Neither survives a cluster re-shuffle, let alone
  * an oracle compare.)
  *
  * Scale shape: bigram extraction is map-only (an in-row transform of
  * the token array — no posexplode self-join); the model tables are
  * plain groupBy counts with map-side partial aggregation; scoring is
  * equi-joins on the gram keys. The bigram table is staged once and
  * feeds all three consumers (bigram counts, prefix counts, per-doc
  * scoring) in one pass.
  */
object NgramLM {

  /** Per-doc bigram stream (doc_id, w1, w2), built in-row:
    * `transform(sequence(1, size-1), i -> (t[i-1], t[i]))` — no
    * shuffle, no positional self-join.
    */
  private def bigrams(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextAnalysis.tokensCol.as("t"))
      .where(size(col("t")) >= 2) // sequence(1, 0) would run DESCENDING
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(t) - 1), i -> named_struct('w1', t[i-1], 'w2', t[i]))")).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))

  /** Per-doc bigram predictability: how much of the doc's bigram
    * stream is corpus-common, relative to how common its contexts
    * are. `mass_bg` = Σ count(w1,w2) over the doc's bigrams, `mass_ctx`
    * = Σ count(w1 as-prefix); the ratio is the corpus-aggregate
    * conditional mass — the rational stand-in for mean P(w2|w1).
    */
  def bigramScore(spark: SparkSession, sfDir: String): DataFrame = {
    val bg = Materialize.stage(bigrams(spark, sfDir))
    val cb = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val cp = bg.groupBy(col("w1")).agg(count(lit(1)).as("cp"))
    bg.join(cb, Seq("w1", "w2")).join(cp, Seq("w1"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("cb")).as("mass_bg"), sum(col("cp")).as("mass_ctx"))
      .select(col("doc_id"), col("n_bigrams"), col("mass_bg"), col("mass_ctx"),
        (col("mass_bg").cast("double") / col("mass_ctx")).as("predictability"))
  }

  /** Doc-frequency floor for pair mining: tokens rarer than this
    * never enter the quadratic per-doc pair step — the pruning that
    * bounds the blowup at corpus scale (rare tokens dominate a real
    * vocabulary by count but can't reach support anyway).
    */
  val MinDf = 5L

  /** Minimum co-occurrence support for an emitted pair. */
  val MinSupport = 20L

  /** Frequent token-pair association mining (market-basket over
    * docs): pairs of tokens co-occurring in ≥ [[MinSupport]] docs,
    * with their lift = n_docs·c_ab / (c_a·c_b). Candidate pairs come
    * from a doc_id equi-self-join of the df-pruned item set — per-doc
    * m² where m is the doc's count of ≥MinDf-frequency distinct
    * tokens, never vocabulary².
    */
  def tokenPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val tokd = docs.select(col("doc_id"),
      explode(array_distinct(TextAnalysis.tokensCol)).as("w"))
    val dfc = Materialize.stage(
      tokd.groupBy(col("w")).agg(count(lit(1)).as("c")))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val items = tokd.join(dfc.where(col("c") >= MinDf).select(col("w")), "w")
    val pairs = items.as("a")
      .join(items.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.w") < col("b.w"))
      .groupBy(col("a.w").as("w_a"), col("b.w").as("w_b"))
      .agg(count(lit(1)).as("c_ab"))
      .where(col("c_ab") >= MinSupport)
    pairs
      .join(dfc.select(col("w").as("w_a"), col("c").as("c_a")), "w_a")
      .join(dfc.select(col("w").as("w_b"), col("c").as("c_b")), "w_b")
      .crossJoin(broadcast(nDocs))
      .select(col("w_a"), col("w_b"), col("c_ab"), col("c_a"), col("c_b"),
        ((col("n_docs") * col("c_ab")).cast("double")
          / (col("c_a") * col("c_b"))).as("lift"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_llm_bigram_lm" -> bigramScore _,
    "q_llm_token_pairs" -> tokenPairs _,
  )

  import TextAnalysis.sqlTokens

  val oracles: Map[String, String] = Map(
    // DuckDB range(a, b) is half-open and t[i] is 1-based, so i in
    // [1, len) pairs t[i] with t[i+1] — same bigrams as the Spark
    // 0-based transform; single-token docs drop out of both.
    "q_llm_bigram_lm" ->
      s"""WITH toks AS (SELECT doc_id, $sqlTokens AS t FROM documents),
         |bg AS (
         |  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
         |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks)),
         |cb AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb FROM bg GROUP BY w1, w2),
         |cp AS (SELECT w1, CAST(count(*) AS BIGINT) AS cp FROM bg GROUP BY w1)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  CAST(sum(cb.cb) AS BIGINT) AS mass_bg,
         |  CAST(sum(cp.cp) AS BIGINT) AS mass_ctx,
         |  CAST(CAST(sum(cb.cb) AS BIGINT) AS DOUBLE)
         |    / CAST(sum(cp.cp) AS BIGINT) AS predictability
         |FROM bg JOIN cb USING (w1, w2) JOIN cp USING (w1)
         |GROUP BY doc_id""".stripMargin,
    "q_llm_token_pairs" ->
      s"""WITH tok AS (
         |  SELECT DISTINCT doc_id, w FROM (
         |    SELECT doc_id, unnest($sqlTokens) AS w FROM documents)),
         |dfc AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY w),
         |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         |items AS (SELECT doc_id, w FROM tok JOIN dfc USING (w) WHERE c >= $MinDf),
         |prs AS (
         |  SELECT a.w AS w_a, b.w AS w_b, CAST(count(*) AS BIGINT) AS c_ab
         |  FROM items a JOIN items b ON a.doc_id = b.doc_id AND a.w < b.w
         |  GROUP BY a.w, b.w HAVING count(*) >= $MinSupport)
         |SELECT w_a, w_b, c_ab, ca.c AS c_a, cb.c AS c_b,
         |  CAST(nd.n_docs * c_ab AS DOUBLE) / (ca.c * cb.c) AS lift
         |FROM prs
         |JOIN dfc ca ON ca.w = prs.w_a
         |JOIN dfc cb ON cb.w = prs.w_b
         |CROSS JOIN nd""".stripMargin,
  )
}
