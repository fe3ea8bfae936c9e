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

  test("temperature mix: allocations sum to the budget exactly and flatten the head") {
    val rows = Pipeline.temperatureMix(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val budget = Pipeline.TemperatureBudget
    assert(rows.map(_._4).sum == budget,
      "largest-remainder apportionment must hit the budget exactly")
    // every allocation is the floor share or floor+1
    val tw = rows.map(_._3).sum
    rows.foreach { case (s, _, w, alloc) =>
      val fl = budget * w / tw
      assert(alloc == fl || alloc == fl + 1, s"source $s: alloc $alloc not in {$fl, ${fl + 1}}")
    }
    // α = 1/2 flattening: the smallest source's WEIGHT share exceeds
    // its document share, the largest's sits below — compared by
    // exact integer cross-multiplication (w/tw vs n_docs/N). The
    // sf0.001 corpus has uniform sources, where flattening is
    // correctly a no-op, so the strict form is gated on a real gap.
    val n = rows.map(_._2).sum
    val smallest = rows.minBy(_._2)
    val largest = rows.maxBy(_._2)
    if (smallest._2 < largest._2) {
      assert(smallest._3 * n > smallest._2 * tw,
        s"tail source ${smallest._1} must be upweighted")
      assert(largest._3 * n < largest._2 * tw,
        s"head source ${largest._1} must be downweighted")
    } else {
      // uniform corpus: every source gets budget/k up to rounding
      val even = budget / rows.length
      rows.foreach { case (s, _, _, alloc) =>
        assert(math.abs(alloc - even) <= 1, s"uniform corpus: $s got $alloc, want ~$even")
      }
    }
    // monotone: more docs never means a smaller allocation
    rows.sortBy(_._2).sliding(2).foreach {
      case Array(a, b) => assert(a._4 <= b._4, s"monotonicity: $a vs $b")
      case _ =>
    }
  }

  test("temperature mix: planted skewed counts — exact apportionment and flattening") {
    import spark.implicits._
    // 10000 vs 100 vs 1: α=1/2 compresses a 10^4:1 head/tail ratio
    // to 10^2:1 in weight space
    val counts = Seq(("head", 10000L), ("mid", 100L), ("tail", 1L))
      .toDF("source", "n_docs")
    val rows = Pipeline.temperatureMixOf(counts, 1000L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._4).sum == 1000L)
    val byName = rows.map(r => r._1 -> r._4).toMap
    // sqrt shares: 100 / 111 ≈ .9009, 10 / 111 ≈ .0900, 1 / 111 ≈ .0090
    assert(byName("head") == 901L && byName("mid") == 90L && byName("tail") == 9L,
      s"got $byName")
    // flattening: head had 99% of docs but gets ~90% of budget; tail
    // had 0.0099% but gets 0.9%
    assert(byName("head") < 10000L * 1000L / 10101L)
    assert(byName("tail") > 1L * 1000L / 10101L)
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
