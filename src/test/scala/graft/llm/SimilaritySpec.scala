package graft.llm

import graft.SparkSpec
import graft.functions.CosineSim.cosine_sim
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  test("cosine_sim expression: exact values, nulls, zero norm") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),   // identical  -> 1.0
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),   // orthogonal -> 0.0
      (Array(1.0f, 1.0f), Array(-1.0f, -1.0f)), // opposite   -> -1.0
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f)))   // zero norm  -> null
      .toDF("a", "b")
    val got = df.select(cosine_sim(col("a"), col("b"))).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(math.abs(got(0).get - 1.0) < 1e-15)
    assert(math.abs(got(1).get) < 1e-15)
    assert(math.abs(got(2).get + 1.0) < 1e-15)
    assert(got(3).isEmpty)
  }

  test("brute-force top-k: k rows per query, ranks 1..k, descending cos") {
    val rows = Similarity.bruteForceTopK(spark, sf001).collect()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.size == Similarity.NumQueries)
    byQuery.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(2))
      assert(sorted.map(_.getInt(2)).toSeq == (1 to Similarity.K))
      val cs = sorted.map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (x, y) => x >= y })
    }
  }

  test("IVF top-k: every vector assigned to exactly one cell; recall reported") {
    val assigned = Similarity.ivfAssign(spark, sf001)
    val n = graft.Tables.embeddings(spark, sf001).count()
    assert(assigned.count() == n)                       // total assignment
    assert(assigned.select("cell").distinct().count() <= Similarity.NumCells)
    val bf = Similarity.bruteForceTopK(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivf.intersect(bf).size.toDouble / bf.size
    info(f"IVF recall vs brute force at sf0.001: $recall%.3f")
    assert(recall > 0.0)
  }

  test("bucketed near-dup pairs are a subset of brute-force pairs; recall reported") {
    val brute = Similarity.embeddingNearDupBrute(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = Similarity.embeddingNearDup(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed.subsetOf(brute),
      s"bucketed produced pairs brute force did not: ${bucketed.diff(brute).take(5)}")
    val recall = if (brute.isEmpty) 1.0 else bucketed.intersect(brute).size.toDouble / brute.size
    info(f"bucketed near-dup recall vs brute force at sf0.001: $recall%.3f " +
      f"(${bucketed.size}/${brute.size} pairs)")
    assert(recall > 0.0)
  }

  test("LSH top-k is a subset of same-bucket exact ranking; reports recall") {
    val bf = Similarity.bruteForceTopK(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // sanity: every LSH hit shares the query's bucket
    val buckets = graft.Tables.embeddings(spark, sf001)
      .select(col("vec_id"), Similarity.signatureCol(col("embedding")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    lsh.foreach { case (q, n) => assert(buckets(q) == buckets(n)) }
    val recall = if (bf.isEmpty) 0.0 else lsh.intersect(bf).size.toDouble / bf.size
    info(f"LSH recall vs brute force at sf0.001: $recall%.3f " +
      f"(${buckets.values.toSet.size} buckets over ${buckets.size} vectors)")
  }
}
