package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NgramLMSpec extends SparkSpec {

  test("bigram score: exact masses, predictability in (0, 1]") {
    val df = NgramLM.bigramScore(spark, sf001).cache()
    assert(df.count() > 0)
    // mass_bg <= mass_ctx row-wise: a bigram's count can't exceed its
    // prefix's as-prefix count, so the doc sums preserve the order
    assert(df.where(col("mass_bg") > col("mass_ctx")).count() == 0)
    assert(df.where(col("predictability") <= 0 || col("predictability") > 1)
      .count() == 0)
    // a doc of n tokens contributes n-1 bigrams
    val tokCheck = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"), (size(TextAnalysis.tokensCol) - 1).as("want"))
      .where(col("want") >= 1)
      .join(df, "doc_id")
      .where(col("n_bigrams") =!= col("want"))
    assert(tokCheck.count() == 0, "bigram count must be token count - 1")
  }

  test("bigram score: single-repeated-token corpus scores exactly 1") {
    import spark.implicits._
    val docs = Seq((1L, "x x x x"), (2L, "x x")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("ngram_tiny")
    // route through the same column logic on a temp corpus
    val toks = docs.select(col("doc_id"), TextAnalysis.tokensCol.as("t"))
      .where(size(col("t")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(t) - 1), i -> named_struct('w1', t[i-1], 'w2', t[i]))")).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val cb = toks.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val cp = toks.groupBy(col("w1")).agg(count(lit(1)).as("cp"))
    val scored = toks.join(cb, Seq("w1", "w2")).join(cp, Seq("w1"))
      .groupBy(col("doc_id"))
      .agg((sum(col("cb")).cast("double") / sum(col("cp"))).as("p"))
    // only bigram is (x, x): every context mass == bigram mass
    assert(scored.where(col("p") =!= 1.0).count() == 0)
  }

  test("perplexity: negative log-probs, exact reconstruction, covers multi-token docs") {
    val df = NgramLM.perplexity(spark, sf001).cache()
    val nMulti = graft.Tables.documents(spark, sf001)
      .where(size(TextAnalysis.tokensCol) >= 2).count()
    assert(df.count() == nMulti, "every >=2-token doc gets a score")
    // smoothed probs are < 1, so every fixed-point log-prob is negative
    assert(df.where(col("fp_sum") >= 0).count() == 0)
    // avg_logprob reconstructs exactly from the exact integers
    val bad = df.withColumn("want",
      col("fp_sum").cast("double") / lit((1L << 30).toDouble) / col("n_bigrams"))
      .where(col("avg_logprob") =!= col("want"))
    assert(bad.count() == 0)
    // the corpus's most templated docs must be more predictable than
    // its least — i.e. the signal is non-degenerate
    val stats = df.agg(min(col("avg_logprob")), max(col("avg_logprob"))).head()
    assert(stats.getDouble(0) < stats.getDouble(1))
    df.unpersist()
  }

  test("source drift: one row per source, KL non-negative, totals tile the corpus") {
    val df = NgramLM.sourceDrift(spark, sf001).cache()
    val nSources = graft.Tables.documents(spark, sf001)
      .select(col("source")).distinct().count()
    assert(df.count() == nSources)
    // KL >= 0 up to fixed-point rounding (each term rounds within
    // 2^-31 of exact, weighted by its token count)
    assert(df.where(col("kl_divergence") < -1e-6).count() == 0)
    val totalToks = graft.Tables.documents(spark, sf001)
      .select(explode(TextAnalysis.tokensCol).as("w")).count()
    assert(df.agg(sum(col("n_tokens"))).head.getLong(0) == totalToks,
      "per-source token totals must tile the corpus")
    df.unpersist()
  }

  test("token pairs: support >= threshold, lift formula exact, ordered pairs") {
    val df = NgramLM.tokenPairs(spark, sf001).cache()
    assert(df.count() > 0, "tiny-vocab corpus must produce frequent pairs")
    assert(df.where(col("c_ab") < NgramLM.MinSupport).count() == 0)
    assert(df.where(col("w_a") >= col("w_b")).count() == 0, "pairs are ordered")
    // support can't exceed either marginal
    assert(df.where(col("c_ab") > least(col("c_a"), col("c_b"))).count() == 0)
    val nDocs = graft.Tables.documents(spark, sf001).count()
    val recomputed = df.withColumn("want",
      (lit(nDocs) * col("c_ab")).cast("double") / (col("c_a") * col("c_b")))
      .where(col("lift") =!= col("want"))
    assert(recomputed.count() == 0, "lift must match n_docs*c_ab/(c_a*c_b)")
  }
}
