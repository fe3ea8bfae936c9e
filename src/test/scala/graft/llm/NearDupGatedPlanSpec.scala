package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Plan-shape pins for the past-2^18 GATED near-dup branch (VERDICT
  * r15 item 5): the r15 scale win rests on three plan shapes that
  * were held only by scaladoc — a refactor could silently re-stage
  * the signature arrays or float the gate above the pair-dedup
  * exchange and nothing would fail until a 1M-rep run DNF'd. The
  * branch is forced here by passing the gate explicitly (the public
  * parameterized entry — same code path [[Similarity.nearDupGateFor]]
  * selects past 2^18 reps), on the spec corpus.
  */
class NearDupGatedPlanSpec extends SparkSpec {

  private def gatedPlan(): String = {
    spark.sharedState.cacheManager.clearCache()
    val emb = graft.Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("embedding"))
    Similarity.nearDupPairsMultiProbe(emb, 16, 8, 2,
        gate = Some(Similarity.NearDupGateTau))
      .queryExecution.executedPlan.toString
  }

  test("gate evaluates BELOW the pair-dedup exchange, codes broadcast") {
    val p = gatedPlan()
    // exactly one exchange keyed on the pair — the candidate-dedup
    // one; the gate and rescore joins must not add more
    val dedupEx = "Exchange hashpartitioning\\(vec_a".r.findAllIn(p).size
    assert(dedupEx == 1, s"expected exactly the dedup exchange on (vec_a, vec_b), got $dedupEx:\n$p")
    // the SQ8 gate must sit UNDER that exchange (map-side,
    // pre-distinct): in the tree string descendants print after
    // their ancestors, so the gate filter's offset must be past the
    // exchange's — a gate floated above the exchange would ship the
    // full λ-junk stream to disk first, the exact r14 DNF shape
    val gateAt = p.indexOf("sq8cos")
    assert(gateAt >= 0, s"gated plan lost the SQ8 gate:\n$p")
    assert(gateAt > p.indexOf("Exchange hashpartitioning(vec_a"),
      s"SQ8 gate floated ABOVE the pair-dedup exchange:\n$p")
    // both gate code sides and both rescore embedding sides reach
    // their joins as broadcasts (the codes are 64 B/rep and the gate
    // already proves the embedding side broadcastable — shuffling
    // either would re-add a candidate-stream exchange)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4,
      s"expected >= 4 broadcast joins (2 gate + 2 rescore):\n$p")
  }

  test("probe-set instrument stages embeddings ONLY — sig arrays recomputed inline") {
    spark.sharedState.cacheManager.clearCache()
    val emb = graft.Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("embedding"))
    val ids = emb.select(col("vec_id")).limit(4)
      .collect().map(_.getLong(0)).toSeq
    val p = Similarity.probeSetCandidatesScored(emb, 16, 8, 2, ids)
      .queryExecution.executedPlan.toString
    // the staged relation (localCheckpoint scan) must carry only
    // (vec_id, embedding): staging the bands-int sig array is the
    // NgramLM unroll-convoy shape — ~40 GB of deserialized storage
    // at the 10M-rep dial, which is what made the 10M probe leg
    // unrunnable before the inline recompute
    val staged = p.linesIterator.filter(_.contains("ExistingRDD")).toSeq
    assert(staged.nonEmpty, s"probe path lost its embedding stage:\n$p")
    staged.foreach { line =>
      assert(!line.contains("sigs"),
        s"sig arrays are STAGED again (unroll-convoy regression):\n$line")
    }
    // and the signatures are computed inline above the stage
    assert(p.toLowerCase.contains("hyperplane"),
      s"inline signature recompute missing from probe plan:\n$p")
  }
}
