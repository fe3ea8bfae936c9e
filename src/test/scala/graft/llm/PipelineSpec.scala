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

  test("sample mix is deterministic and separates per-language keep rates") {
    def run() = Pipeline.sampleMix(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val a = run(); val b = run()
    assert(a == b, "hash-gated sampling must be re-run stable")
    a.foreach { case (lang, (total, kept)) =>
      assert(kept <= total, s"$lang kept more than it had")
    }
    def frac(l: String) = a(l)._2.toDouble / a(l)._1
    // en is gated at 90%, zh at 20% — the observed fractions must
    // reflect the mixture even with binomial noise at 500 docs
    assert(frac("en") > frac("zh"),
      f"en ${frac("en")}%.2f should exceed zh ${frac("zh")}%.2f")
    assert(frac("en") > 0.7 && frac("zh") < 0.45)
  }

  test("observe() metrics surface pipeline stage counters without extra actions") {
    val df = Pipeline.trainingPrep(spark, sf001)
    df.collect()
    val gated = df.queryExecution.observedMetrics("gated")
    assert(gated.getAs[Long]("rows_after_gate") > 0,
      "the gated-stage counter should have counted surviving rows")
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

  test("quota sample: exactly min(10, |source|) docs per source, deterministic") {
    def run() = Pipeline.quotaSample(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    val rows = run()
    val bySrc = rows.groupBy(_._2)
    val sizes = graft.Tables.documents(spark, sf001)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (s, n) =>
      assert(bySrc.get(s).map(_.length.toLong).getOrElse(0L) == math.min(10L, n),
        s"source $s: quota violated")
    }
    bySrc.values.foreach { g =>
      assert(g.map(_._3).sorted.toSeq == (1L to g.length), "ranks must be 1..n")
    }
    assert(rows.toSet == run().toSet, "hash-ordered sampling must be re-run-stable")
  }

  test("grouped split: no source straddles train/val; doc counts partition the corpus") {
    val rows = Pipeline.groupedSplit(spark, sf001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // leakage-safety by construction: one (source, split) row per source
    assert(rows.map(_._1).distinct.length == rows.length,
      s"a source appears in both splits: ${rows.mkString(", ")}")
    val total = graft.Tables.documents(spark, sf001).count()
    assert(rows.map(_._3).sum == total, "split must partition the corpus")
    assert(rows.forall(r => r._2 == "train" || r._2 == "val"))
  }
}
