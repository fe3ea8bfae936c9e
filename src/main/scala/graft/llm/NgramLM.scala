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
  * equi-joins on the gram keys. The bigram stream is NOT staged
  * (r14): the map work is ~10 s a pass off the columnar scan, while a
  * localCheckpoint of the ~1B-row stream unrolls it DESERIALIZED into
  * the shared storage pool — 31/32 task threads measured blocked in
  * `MemoryStore.reserveUnrollMemoryForThisTask` (a lock convoy, not
  * disk), ×1000 isolated A/B: perplexity 132.0 → 57.8 s min-of-3,
  * bigram_lm > 1200 s staged (killed) vs 57.7 s unstaged — the
  * Boilerplate r13 recompute-don't-stage ruling at 20× the mass. The
  * vocab-sized COUNT tables stay staged (read twice, small).
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
    val bg = bigrams(spark, sfDir)
    // the model tables: cb aggregates the occurrence stream ONCE;
    // cp is the w2-marginal of cb (Σ_w2 count(w1,w2) = count(w1·)),
    // a gram-vocab-sized rollup — NOT a second count pass over the
    // ~1B-row bigram stream
    val cb = Materialize.stage(
      bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb")),
      eager = false)
    val cp = cb.groupBy(col("w1")).agg(sum(col("cb")).as("cp"))
    // attach BOTH counts per distinct gram first (vocab-sized join),
    // so the ~1B-row occurrence stream is joined ONCE, not twice;
    // hash-build the gram table (shuffle_hash): sort-merging would
    // sort the per-occurrence stream for a join whose output
    // collapses straight into a per-doc aggregate. Measured at
    // ×1000 (isolated min-of-2): 127.6 s → 68.9 s two-join hinted,
    // further with the single join.
    val gram = cb.join(graft.operators.ScaleHints.shjIfBigFact(spark,
        s"$sfDir/documents.parquet", cp,
        graft.operators.ScaleHints.TextFactMinBytes), Seq("w1"))
    bg.join(graft.operators.ScaleHints.shjIfBigFact(spark,
        s"$sfDir/documents.parquet", gram,
        graft.operators.ScaleHints.TextFactMinBytes), Seq("w1", "w2"))
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
    val items = tokd.join(
      graft.operators.ScaleHints.shjIfBigFact(spark,
        s"$sfDir/documents.parquet", dfc.where(col("c") >= MinDf).select(col("w")),
        graft.operators.ScaleHints.TextFactMinBytes), "w")
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

  /** Per-document perplexity under the corpus's own Laplace-smoothed
    * bigram LM — the actual LM-score filter (low-perplexity ≈
    * predictable/templated text, high ≈ noise) that
    * [[bigramScore]]'s rational mass ratio stands in for. The
    * module's "no logs" discipline is upgraded, not broken, by the
    * technique proven on q_search_bm25: `ln` is bit-identical across
    * engines (faithfully-rounded libm on identical double inputs),
    * and each bigram's log-prob crosses the per-doc sum as a
    * fixed-point BIGINT (`floor(lp·2³⁰+0.5)`), so the sum is
    * associative and partition-order-free; the terminal average is a
    * pure division of exact integers. `fp_sum` (exact BIGINT) is
    * emitted alongside, so the core signal stays integer-exact.
    * The exponentiated form `perplexity = exp(-avg_logprob)` is
    * deliberately LEFT TO THE CONSUMER: unlike ln, `exp` diverges in
    * the last ulp between the JVM intrinsic and libm (measured: 4.6%
    * of rows at sf0.01), and the ranking is identical either way —
    * avg_logprob is monotone in perplexity.
    *
    * Smoothing: p(w2|w1) = (c(w1,w2)+1) / (c(w1·)+V), V = corpus
    * token vocabulary (one broadcast one-row aggregate). Scale shape
    * identical to [[bigramScore]]: in-row bigram stream (recomputed
    * per pass, never staged — the unroll-convoy ruling above), two
    * count aggregations, gram-key equi-joins, one final doc_id
    * aggregation.
    */
  def perplexity(spark: SparkSession, sfDir: String): DataFrame = {
    val q30 = 1L << 30
    val bg = bigrams(spark, sfDir)
    // cb once over the stream, cp as its w2-marginal ([[bigramScore]])
    val cb = Materialize.stage(
      bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb")),
      eager = false)
    val cp = cb.groupBy(col("w1")).agg(sum(col("cb")).as("cp"))
    val vocab = Tables.documents(spark, sfDir)
      .select(explode(TextAnalysis.tokensCol).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    val avg = col("fp_sum").cast("double") / lit(q30.toDouble) / col("n_bigrams")
    // fp is a function of the GRAM, not the occurrence: one ln per
    // distinct (w1,w2) on the vocab-sized count table (all-small
    // joins), so the single corpus-mass join below carries one
    // 8-byte long — not (cb, cp, v) per occurrence — and the ~1B-row
    // stream is joined once, not twice. Same per-row fp values, so
    // the oracle (which scores per occurrence) hash-matches unchanged.
    val fpTab = cb.join(graft.operators.ScaleHints.shjIfBigFact(spark,
        s"$sfDir/documents.parquet", cp,
        graft.operators.ScaleHints.TextFactMinBytes), Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"),
        floor(log((col("cb") + 1).cast("double") / (col("cp") + col("v")).cast("double"))
          * q30 + lit(0.5)).cast("long").as("fp"))
    bg.join(graft.operators.ScaleHints.shjIfBigFact(spark,
        s"$sfDir/documents.parquet", fpTab,
        graft.operators.ScaleHints.TextFactMinBytes), Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("fp")).as("fp_sum"))
      .select(col("doc_id"), col("n_bigrams"), col("fp_sum"),
        avg.as("avg_logprob"))
  }

  /** Per-source token-distribution drift: KL(source ‖ corpus) — the
    * corpus-monitoring signal that flags a crawl slice whose language
    * has shifted from the mixture (new boilerplate, a scraper gone
    * wrong, an injected spam source) before it trains into the model.
    *
    * KL = Σ_w p_w · ln(p_w/q_w) with p the source's token
    * distribution and q the corpus's; every source token appears in
    * the corpus by construction, so no smoothing is needed. Each
    * term's ratio is the exact-integer form c_sw·T / (c_w·T_s) —
    * one ln per (source, token) — and terms cross the per-source sum
    * as `c_sw`-weighted fixed-point BIGINTs (the [[perplexity]]
    * discipline): kl_fp = Σ c_sw·floor(ln(ratio)·2³⁰+0.5), divided
    * once by T_s at the end. Non-negative up to fixed-point rounding
    * (each term rounds within 2⁻³¹·c_sw).
    *
    * Scale: ONE pass over the corpus — the (source, token) counts
    * (map-side combined) — from which the token counts, the corpus
    * total, and the per-source totals are all marginals: c_w =
    * Σ_source c_sw, t_all = Σ c_sw, t_s = Σ_w c_sw. The raw exploded
    * token stream (corpus-mass — ~1B rows at ×1000) is never
    * materialized and never scanned twice; everything past the first
    * aggregation is (source × vocab)-bounded.
    */
  def sourceDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val q30 = 1L << 30
    val st = Materialize.stage(Tables.documents(spark, sfDir)
      .select(col("source"), explode(TextAnalysis.tokensCol).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c_sw")),
      eager = false)
    val ct = st.groupBy(col("w")).agg(sum(col("c_sw")).as("c_w"))
    val totals = st.agg(sum(col("c_sw")).as("t_all"))
    val sTot = st.groupBy(col("source")).agg(sum(col("c_sw")).as("t_s"))
    st.join(ct, "w")
      .join(sTot, "source")
      .crossJoin(broadcast(totals))
      .withColumn("fp",
        col("c_sw") * floor(
          log((col("c_sw") * col("t_all")).cast("double")
            / (col("c_w") * col("t_s")).cast("double")) * q30 + lit(0.5)).cast("long"))
      .groupBy(col("source"))
      .agg(countDistinct(col("w")).as("n_vocab"),
        max(col("t_s")).as("n_tokens"),
        sum(col("fp")).as("kl_fp"))
      .select(col("source"), col("n_vocab"), col("n_tokens"),
        (col("kl_fp").cast("double") / lit(q30.toDouble) / col("n_tokens"))
          .as("kl_divergence"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_llm_bigram_lm" -> bigramScore _,
    "q_llm_token_pairs" -> tokenPairs _,
    "q_llm_perplexity" -> perplexity _,
    "q_llm_source_drift" -> sourceDrift _,
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
    "q_llm_perplexity" ->
      s"""WITH toks AS (SELECT doc_id, $sqlTokens AS t FROM documents),
         |bg AS (
         |  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
         |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks)),
         |cb AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb FROM bg GROUP BY w1, w2),
         |cp AS (SELECT w1, CAST(count(*) AS BIGINT) AS cp FROM bg GROUP BY w1),
         |v AS (
         |  SELECT CAST(count(DISTINCT w) AS BIGINT) AS v
         |  FROM (SELECT unnest($sqlTokens) AS w FROM documents)),
         |scored AS (
         |  SELECT doc_id,
         |    CAST(floor(ln(CAST(cb.cb + 1 AS DOUBLE) / CAST(cp.cp + v.v AS DOUBLE))
         |      * 1073741824 + 0.5) AS BIGINT) AS fp
         |  FROM bg JOIN cb USING (w1, w2) JOIN cp USING (w1) CROSS JOIN v)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  CAST(sum(fp) AS BIGINT) AS fp_sum,
         |  CAST(sum(fp) AS DOUBLE) / 1073741824.0 / count(*) AS avg_logprob
         |FROM scored GROUP BY doc_id""".stripMargin,
    "q_llm_source_drift" ->
      s"""WITH tok AS (
         |  SELECT source, unnest($sqlTokens) AS w FROM documents),
         |st AS (
         |  SELECT source, w, CAST(count(*) AS BIGINT) AS c_sw
         |  FROM tok GROUP BY source, w),
         |ct AS (SELECT w, CAST(count(*) AS BIGINT) AS c_w FROM tok GROUP BY w),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS t_all FROM tok),
         |stot AS (
         |  SELECT source, CAST(sum(c_sw) AS BIGINT) AS t_s
         |  FROM st GROUP BY source),
         |terms AS (
         |  SELECT st.source, st.w, st.c_sw, stot.t_s,
         |    st.c_sw * CAST(floor(
         |      ln(CAST(st.c_sw * tot.t_all AS DOUBLE)
         |         / CAST(ct.c_w * stot.t_s AS DOUBLE)) * 1073741824 + 0.5)
         |      AS BIGINT) AS fp
         |  FROM st JOIN ct USING (w) JOIN stot USING (source) CROSS JOIN tot)
         |SELECT source,
         |  CAST(count(DISTINCT w) AS BIGINT) AS n_vocab,
         |  CAST(max(t_s) AS BIGINT) AS n_tokens,
         |  CAST(sum(fp) AS DOUBLE) / 1073741824.0 / max(t_s) AS kl_divergence
         |FROM terms GROUP BY source""".stripMargin,
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
