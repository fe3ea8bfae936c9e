package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class HybridSpec extends SparkSpec {

  test("hybrid top-k: sane shape, scores bounded, ranks contiguous") {
    val rows = Hybrid.hybridTopK(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      assert(rs.map(_.getInt(2)).sorted.toSeq == (1 to rs.length))
      assert(rs.length <= Similarity.K)
      rs.foreach { r =>
        val score = r.getDouble(3)
        assert(score >= -Hybrid.WCos - 1e-12 && score <= 1.0 + 1e-12)
      }
    }
  }

  test("rrf fusion: ranks contiguous, fused score reconstructs from channel ranks") {
    val rows = Hybrid.rrfTopK(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      assert(rs.map(_.getInt(2)).sorted.toSeq == (1 to rs.length))
      assert(rs.length <= Similarity.K)
    }
    rows.foreach { r =>
      val (rd, rsp, score) = (r.getLong(4), r.getLong(5), r.getDouble(3))
      assert(rd > 0 || rsp > 0, "candidate must come from at least one channel")
      val expect = (if (rd > 0) 1.0 / (Hybrid.RrfC + rd) else 0.0) +
        (if (rsp > 0) 1.0 / (Hybrid.RrfC + rsp) else 0.0)
      assert(math.abs(score - expect) < 1e-15, s"rrf=$score expect=$expect")
    }
  }

  test("sparse channel reaches a neighbor the dense channel cannot") {
    import spark.implicits._
    // vec 0 and vec 25 share ONE rare token but have OPPOSITE
    // embeddings: every hyperplane bit flips, so they are never
    // bucket-mates — only the rare-term join can pair them. All other
    // docs use disjoint filler vocabulary (df = 1 per filler token,
    // but never SHARED, so they generate no sparse candidates with 0).
    val dim = Similarity.Dim
    def vec(sign: Float) = Array.tabulate(dim)(i => sign * (i + 1f))
    val emb = Seq((0L, vec(1f)), (25L, vec(-1f)))
      .toDF("vec_id", "embedding")
    val docs = Seq(
      (0L, "zzqx alpha0 beta0 gamma0"),
      (25L, "zzqx alpha25 beta25 gamma25"))
      .toDF("doc_id", "text")
    // sanity: the two really are in different buckets (dense-unreachable)
    val buckets = emb
      .select(col("vec_id"), Similarity.signatureCol(col("embedding")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(buckets(0L) != buckets(25L), s"bucket collision: $buckets")
    val rows = Hybrid.hybridTopKOf(emb, docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4), r.getDouble(5)))
    val hit = rows.find { case (q, n, _, _) => q == 0L && n == 25L }
    assert(hit.nonEmpty, s"planted sparse-only pair (0, 25) missing from ${rows.toSeq}")
    // genuinely sparse-only: opposite vectors (cos = -1), positive jac
    assert(math.abs(hit.get._3 + 1.0) < 1e-12)
    assert(hit.get._4 > 0.0)
  }

  test("scoring: a doc sharing more rare vocabulary outranks a bucket-mate with none") {
    // every returned (q, n) with jac > 0 that beats a jac == 0 row of
    // the same query must have score ordering consistent with rank
    val rows = Hybrid.hybridTopK(spark, sf001).collect()
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(2))
      val scores = sorted.map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }
}
