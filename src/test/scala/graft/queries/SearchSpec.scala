package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SearchSpec extends SparkSpec {

  test("positional index: offsets reconstruct the token stream of a planted doc") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("posidx").toString
    Seq(
      (0L, "to be or not to be", "en", "web", 18L),
      (1L, "  be  to", "en", "web", 8L) // leading/extra whitespace shifts nothing
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Search.positionalIndex(spark, dir).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getString(3))))
      .toMap
    assert(rows(("to", 0L)) == (2L, "1,5"))
    assert(rows(("be", 0L)) == (2L, "2,6"))
    assert(rows(("or", 0L)) == (1L, "3"))
    assert(rows(("not", 0L)) == (1L, "4"))
    // doc 1 splits to ["", "be", "to"]: the leading empty holds pos 1,
    // consecutive whitespace is ONE separator (no interior empties)
    assert(rows(("be", 1L)) == (1L, "2"))
    assert(rows(("to", 1L)) == (1L, "3"))
  }

  test("phrase search finds exactly the docs with adjacent 'hash join' tokens") {
    val dir = "/root/testdata/sf0.001"
    val hits = Search.phraseSearch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(hits.nonEmpty, "corpus is known to contain 'hash join'")
    // independent ground truth: scan the token stream driver-side
    val expected = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .flatMap { r =>
        val toks = r.getString(1).split("\\s+").filter(_.nonEmpty)
        val matches = toks.indices.dropRight(1)
          .filter(i => toks(i) == "hash" && toks(i + 1) == "join")
        if (matches.isEmpty) None
        else Some((r.getLong(0), matches.size.toLong))
      }.toMap
    assert(hits.map(h => (h._1, h._2)).toMap == expected)
    hits.foreach { case (_, n, firstPos) =>
      assert(n >= 1 && firstPos >= 1)
    }
  }

  test("index probe: bucket-pruned scan, results identical to the inline join") {
    val dir = "/root/testdata/sf0.001"
    val probe = Search.phraseIndexProbe(spark, dir)
    val plan = probe.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
      s"probe must prune to one bucket per word:\n$plan")
    val inline = Search.phraseSearch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val probed = probe.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(probed == inline)
  }

  test("bm25: tf saturation and length normalization order a planted corpus") {
    import spark.implicits._
    // A: 'hash' 3x in 6 tokens (high tf, short);
    // B: 'hash' 1x in 12 tokens (low tf, long) -> A outranks B;
    // C: matches two query terms with the same dl as B -> C outranks B;
    // D: no query term -> absent from the ranking.
    val docs = Seq(
      (1L, "hash hash hash pad pad pad"),
      (2L, "hash pad pad pad pad pad pad pad pad pad pad pad"),
      (3L, "hash join pad pad pad pad pad pad pad pad pad pad"),
      (4L, "pad pad pad pad pad pad")).toDF("doc_id", "text")
    val rows = Search.bm25TopKOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSet == Set(1L, 2L, 3L), "only term-matching docs rank")
    val score = rows.map(r => r._1 -> r._3).toMap
    assert(score(1L) > score(2L), "tf saturation: 3x hash in a short doc wins")
    assert(score(3L) > score(2L), "two matched terms beat one at equal length")
    val sorted = rows.sortBy(r => (-r._3, r._1)).map(_._1).toSeq
    assert(rows.map(_._1).toSeq == sorted, "output is rank-ordered")
    assert(rows.find(_._1 == 3L).get._2 == 2L, "doc 3 matches two terms")
  }

  test("bm25 over the corpus: bounded output, scores positive and ordered") {
    val rows = Search.bm25TopK(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.forall(r => r._2 >= 1 && r._2 <= Search.QueryTerms.length))
    assert(rows.forall(_._3 > 0.0))
    val resorted = rows.sortBy(r => (-r._3, r._1)).toSeq
    assert(rows.toSeq == resorted)
  }
}
