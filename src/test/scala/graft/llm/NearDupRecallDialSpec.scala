package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The `spark.graft.neardup.recall` dial (VERDICT r11 item 5): the
  * measured escalation point must be selectable by conf, and on a
  * planted-duplicate corpus the high dial's scored pair set must be a
  * SUPERSET of the default's — escalation may only add recall, never
  * lose a pair the default finds. (Both dials' recall numbers are
  * recorded in BASELINE.md's r11 grid: 0.855 default / 0.917 high
  * planted at n = 200k.)
  */
class NearDupRecallDialSpec extends SparkSpec {

  /** sf0.001 embeddings plus 50 seeded perturbed copies with known
    * above-gate cosine to their bases — the [[graft.PlantedRecallProbe]]
    * construction at spec scale.
    */
  private lazy val planted: (org.apache.spark.sql.DataFrame, Set[(Long, Long)]) = {
    val emb = graft.Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("embedding"))
    val maxId = emb.agg(max(col("vec_id"))).head.getLong(0)
    val bases = emb.limit(50).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val rnd = new java.util.Random(7)
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val copies = bases.zipWithIndex.map { case ((bid, bv), k) =>
      val v = bv.map(_.toDouble)
      val norm = math.sqrt(v.map(x => x * x).sum)
      val u = unit(v)
      val c = 0.45 + 0.5 * rnd.nextDouble()
      val w = Array.fill(v.length)(rnd.nextGaussian())
      val dwu = w.zip(u).map { case (a, b) => a * b }.sum
      val orth = unit(w.zip(u).map { case (a, b) => a - dwu * b })
      val s = math.sqrt(1.0 - c * c)
      (maxId + 1 + k,
        u.zip(orth).map { case (ui, oi) => (norm * (c * ui + s * oi)).toFloat },
        bid)
    }
    import spark.implicits._
    val copyDf = copies.map { case (cid, e, _) => (cid, e) }.toSeq
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val truth = copies.map { case (cid, _, bid) =>
      (math.min(bid, cid), math.max(bid, cid)) }.toSet
    (emb.unionByName(copyDf), truth)
  }

  private def pairsWith(dial: (Int, Int, Int)): Set[(Long, Long)] = {
    val (b, r, t) = dial
    Similarity.nearDupWithDupCollapse(planted._1, b, r, t).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
  }

  test("conf selects the measured operating points and rejects junk") {
    val reps = 1000L
    assert(Similarity.nearDupDialFor(spark, reps) ==
      (Similarity.NearDupBands, Similarity.nearDupRepPlanesFor(reps),
        Similarity.NearDupProbes))
    spark.conf.set("spark.graft.neardup.recall", "high")
    try {
      assert(Similarity.nearDupDialFor(spark, reps) ==
        (2 * Similarity.NearDupBands,
          Similarity.nearDupRepPlanesFor(reps) + 1, 3))
      // past 2^18 reps the high dial doubles bands at the SAME r
      // (the r13 lesson kept under the r15 uncapped rule: deepening
      // r costs more collisions than its halved occupancy buys).
      // (conf is still "high".)
      assert(Similarity.nearDupDialFor(spark, 1000000L) == (724, 18, 3))
      assert(Similarity.nearDupDialFor(spark, 10000000L) == (2896, 22, 3))
      spark.conf.unset("spark.graft.neardup.recall")
      assert(Similarity.nearDupDialFor(spark, 1000000L) == (362, 18, 3))
      assert(Similarity.nearDupDialFor(spark, 10000000L) == (1448, 22, 3))
      spark.conf.set("spark.graft.neardup.recall", "maximal")
      intercept[IllegalArgumentException] {
        Similarity.nearDupDialFor(spark, reps)
      }
    } finally spark.conf.unset("spark.graft.neardup.recall")
  }

  test("high dial's pair set is a superset of default's; planted recall no worse") {
    val (corpus, truth) = planted
    val reps = corpus.select(col("embedding")).distinct().count()
    val defPairs = pairsWith(Similarity.nearDupDialFor(spark, reps))
    spark.conf.set("spark.graft.neardup.recall", "high")
    val highPairs =
      try pairsWith(Similarity.nearDupDialFor(spark, reps))
      finally spark.conf.unset("spark.graft.neardup.recall")
    assert(defPairs.subsetOf(highPairs),
      s"default-only pairs: ${(defPairs -- highPairs).take(5)}")
    val defRecall = (truth & defPairs).size.toDouble / truth.size
    val highRecall = (truth & highPairs).size.toDouble / truth.size
    assert(highRecall >= defRecall,
      s"high recall $highRecall < default $defRecall")
    assert(highRecall >= 0.8, s"planted recall too low: $highRecall")
  }

  test("the registered query honors the conf") {
    spark.conf.set("spark.graft.neardup.recall", "high")
    val viaConf =
      try Similarity.embeddingNearDup(spark, sf001).count()
      finally spark.conf.unset("spark.graft.neardup.recall")
    val emb = graft.Tables.embeddings(spark, sf001)
    val reps = emb.select(col("embedding")).distinct().count()
    val direct = Similarity.nearDupWithDupCollapse(
      emb.select(col("vec_id"), col("embedding")),
      2 * Similarity.NearDupBands,
      Similarity.nearDupRepPlanesFor(reps) + 1, 3).count()
    assert(viaConf == direct)
  }
}
