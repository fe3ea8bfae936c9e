package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkylineSampleSpec extends SparkSpec {

  test("skyline equals the pairwise NOT-EXISTS dominance definition") {
    val d = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"), graft.llm.TextAnalysis.qualityCol.as("q"),
        col("n_chars"))
      .where(col("q").isNotNull)
      .cache()
    // brute force: dominated iff some other doc is strictly better on both
    val dominated = d.as("x").join(d.as("y"),
        col("y.q") > col("x.q") && col("y.n_chars") > col("x.n_chars"),
        "left_semi")
      .select(col("x.doc_id").as("doc_id"))
    val want = d.join(dominated, Seq("doc_id"), "left_anti")
      .select(col("doc_id")).orderBy(col("doc_id"))
      .collect().map(_.getLong(0)).toSeq
    val got = Stats.skylineDocs(spark, sf001)
      .select(col("doc_id")).orderBy(col("doc_id"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == want, s"skyline mismatch: got $got want $want")
    assert(got.nonEmpty)
  }

  test("weighted sample: exact k, deterministic, favors longer docs") {
    val s1 = graft.llm.Pipeline.weightedSample(spark, sf001)
    val s2 = graft.llm.Pipeline.weightedSample(spark, sf001)
    val r1 = s1.orderBy(col("doc_id")).collect().toSeq
    assert(r1 == s2.orderBy(col("doc_id")).collect().toSeq, "must be re-run stable")
    assert(r1.size == 128)
    // selection pressure: sampled docs are longer on average than the corpus
    val sampledAvg = s1.agg(avg(col("n_chars"))).head().getDouble(0)
    val corpusAvg = graft.Tables.documents(spark, sf001)
      .agg(avg(col("n_chars"))).head().getDouble(0)
    assert(sampledAvg > corpusAvg,
      f"length-weighted sample should skew long: $sampledAvg%.1f <= $corpusAvg%.1f")
  }
}
