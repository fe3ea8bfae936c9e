package graft.llm

import graft.SparkSpec

/** Ground-truth dedup at 10× the sf0.1 document count: a synthetic
  * corpus where duplicate structure is KNOWN, so precision/recall of
  * the whole pipeline (shingle → MinHash → LSH bands → clusters) is
  * measurable, not just hash-compared.
  */
class DedupScaleSpec extends SparkSpec {

  /** 5000 base docs; every 10th doc gets an exact dup and a near-dup
    * (one word changed), each as extra docs — 6000 total, 500 clusters
    * of 3, 4500 singletons. Deterministic seed.
    */
  private lazy val corpusDir: String = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron",
      "pi", "rho", "sigma", "tau", "upsilon", "phi", "chi", "psi", "omega",
      "red", "green", "blue", "cyan", "magenta", "yellow", "black")
    val base = (0 until 5000).map { i =>
      (i.toLong, (0 until 40).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    var nextId = 5000L
    val extras = base.collect { case (id, text) if id % 10 == 0 =>
      val exact = (nextId, text); nextId += 1
      val words = text.split(" "); words(20) = "CHANGED"
      val near = (nextId, words.mkString(" ")); nextId += 1
      Seq(exact, near)
    }.flatten
    val rows = (base ++ extras).map { case (id, t) =>
      (id, t, "en", s"src$id", t.length.toLong)
    }
    val dir = java.nio.file.Files.createTempDirectory("dedupscale").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(8).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("pipeline recovers the planted duplicate clusters (6000 docs)") {
    val t0 = System.nanoTime()
    val clusters = Dedup.dedupClusters(spark, corpusDir).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    val byDoc = clusters.map(r => r.getLong(0) -> r.getLong(1)).toMap

    // planted structure: doc i (i%10==0, i<5000) + its two extras
    val planted = (0 until 5000 by 10).map(_.toLong)
    var found = 0
    var nearFound = 0
    planted.zipWithIndex.foreach { case (baseId, idx) =>
      val exactId = 5000L + idx * 2
      val nearId = 5000L + idx * 2 + 1
      if (byDoc(exactId) == byDoc(baseId)) found += 1
      if (byDoc(nearId) == byDoc(baseId)) nearFound += 1
    }
    info(f"exact-dup recall ${found / 500.0}%.3f, near-dup recall ${nearFound / 500.0}%.3f, $secs%.1f s")
    assert(found == 500, s"exact dups must always cluster: $found/500")
    assert(nearFound >= 450, s"near-dup recall too low: $nearFound/500")

    // precision: docs NOT planted as dups stay singletons
    val dupDocs = clusters.filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    val plantedDups = planted.zipWithIndex.flatMap { case (_, idx) =>
      Seq(5000L + idx * 2, 5000L + idx * 2 + 1)
    }.toSet
    val falseDups = dupDocs -- plantedDups
    info(s"false-positive dups: ${falseDups.size}")
    assert(falseDups.size <= 25, // 0.5% of corpus
      s"too many false positives: ${falseDups.size}")
  }

  test("simhash separates planted near-dups from random pairs") {
    val sh = Dedup.simhash(spark, corpusDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val planted = (0 until 5000 by 10).map(_.toLong)
    val nearDists = planted.zipWithIndex.map { case (baseId, idx) =>
      hamming(sh(baseId), sh(5000L + idx * 2 + 1))
    }
    val rnd = new scala.util.Random(11)
    val randomDists = (0 until 500).map { _ =>
      hamming(sh(rnd.nextInt(5000).toLong), sh(rnd.nextInt(5000).toLong))
    }
    val nearAvg = nearDists.sum.toDouble / nearDists.size
    val randAvg = randomDists.sum.toDouble / randomDists.size
    info(f"avg hamming: planted near-dups $nearAvg%.2f vs random pairs $randAvg%.2f")
    assert(nearAvg < randAvg / 2,
      s"simhash should separate near-dups ($nearAvg) from random ($randAvg)")
  }
}
