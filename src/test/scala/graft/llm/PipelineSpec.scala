package graft.llm

import graft.SparkSpec

class PipelineSpec extends SparkSpec {

  test("chunking covers every token; consecutive chunks overlap by 8") {
    val toks = graft.jobs.CanonicalJobs.tokens(spark, sf001)
      .groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chunks = Pipeline.chunk(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(3)))
      .groupBy(_._1)
    chunks.foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_._2)
      // chunk ids are consecutive from 0
      assert(sorted.map(_._2).toSeq == sorted.indices.toSeq)
      // coverage: stride 24 with size-32 chunks spans all n tokens
      val n = toks(doc)
      val covered = 24L * (sorted.size - 1) + sorted.last._3
      assert(covered == n, s"doc $doc: covered $covered of $n tokens")
      // every chunk except possibly the last is full
      sorted.init.foreach { case (_, _, len) => assert(len == 32) }
      assert(sorted.last._3 > 0 && sorted.last._3 <= 32)
    }
  }

  test("train/val split is ~95/5 and deterministic") {
    val a = Pipeline.trainValSplit(spark, sf001).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val b = Pipeline.trainValSplit(spark, sf001).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(a == b)
    val train = a.collect { case ((_, "train"), n) => n }.sum
    val total = a.values.sum
    assert(train.toDouble / total > 0.85 && train.toDouble / total < 0.99)
  }
}
