package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private val footer = "this page is part of the acme corp document archive"

  private def corpus = Seq(
    (1L, s"alpha beta gamma delta. $footer"),
    (2L, s"completely different body text here okay. $footer"),
    (3L, s"third unrelated document content words go on. $footer"),
    (4L, "no shared material in this one at all beyond chance words"),
    (5L, "short doc"), // < 8 tokens: contributes no spans
  ).toDF("doc_id", "text")

  test("a footer shared by 3 docs surfaces as the top span") {
    val top = Boilerplate.repeatedSpans(corpus, n = 8, k = 5)
      .orderBy(desc("n_docs"), desc("n_occ"), asc("span"))
      .as[(String, Long, Long)].collect()
    assert(top.nonEmpty)
    assert(top.head._2 == 3L, s"expected df=3 for the footer, got $top")
    assert(top.head._1.split(" ").length == 8)
    assert(footer.contains(top.head._1))
    // every reported span really occurs in >= 2 docs
    assert(top.forall(_._2 >= 2))
  }

  test("spans unique to one document never appear") {
    val spans = Boilerplate.repeatedSpans(corpus, n = 8, k = 100)
      .as[(String, Long, Long)].collect()
    assert(spans.forall(_._2 >= 2))
    assert(!spans.exists(_._1.contains("beyond chance")))
  }

  test("occurrence count exceeds doc count when a doc repeats the span") {
    val rep = Seq(
      (1L, s"$footer and then once more $footer"),
      (2L, footer)).toDF("doc_id", "text")
    val rows = Boilerplate.repeatedSpans(rep, n = 8, k = 100)
      .as[(String, Long, Long)].collect()
    val full = rows.filter(_._1 == footer.split(" ").take(8).mkString(" "))
    assert(full.nonEmpty)
    assert(full.head._2 == 2L && full.head._3 == 3L)
  }

  test("strip removes exactly the flagged footer tokens and keeps the rest") {
    val rows = Boilerplate.stripSpans(corpus, Boilerplate.repeatedSpans(corpus))
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // docs 1-3 lose their footer (10 tokens, all covered by the three
    // flagged 8-gram windows); their distinct bodies survive
    assert(rows(1L)._2 == "alpha beta gamma delta.")
    assert(rows(2L)._2 == "completely different body text here okay.")
    assert(rows(3L)._2 == "third unrelated document content words go on.")
    // doc 4 shares nothing: untouched, zero flagged spans
    assert(rows(4L)._2 ==
      "no shared material in this one at all beyond chance words")
    assert(rows(4L)._4 == 0L)
    // doc 5 is shorter than a span: untouched
    assert(rows(5L)._2 == "short doc")
    // bookkeeping: n_kept counts the surviving tokens
    rows.values.foreach { r =>
      val kept = if (r._2.isEmpty) 0 else r._2.split(" ").length
      assert(r._5 == kept.toLong, s"doc ${r._1}")
      assert(r._5 <= r._3)
    }
  }

  test("strip of a fully-boilerplate doc yields empty text, n_kept 0") {
    val dup = Seq(
      (1L, footer),
      (2L, footer)).toDF("doc_id", "text")
    val rows = Boilerplate.stripSpans(dup, Boilerplate.repeatedSpans(dup))
      .as[(Long, String, Long, Long, Long)].collect()
    rows.foreach { r =>
      assert(r._2 == "")
      assert(r._5 == 0L)
    }
  }

  test("the k cut is deterministic under repartitioning") {
    val a = Boilerplate.repeatedSpans(corpus, n = 8, k = 3)
      .as[(String, Long, Long)].collect().toSet
    val b = Boilerplate.repeatedSpans(corpus.repartition(13), n = 8, k = 3)
      .as[(String, Long, Long)].collect().toSet
    assert(a == b)
  }
}
