package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[Postings]] must agree with the split/posexplode/groupBy
  * construction it replaced — on the whole sf0.01 corpus AND on
  * adversarial whitespace layouts (leading/trailing runs, every Java
  * `\s` char, non-`\s` unicode spaces, supplementary code points,
  * repeated words) — and its interpreted and codegen paths must agree
  * (the house native-expression discipline).
  */
class PostingsSpec extends SparkSpec {

  /** The original formulation: positions over the UNFILTERED split,
    * empties dropped after assignment, per-(word, doc) aggregation.
    */
  private def groupByFrame(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        posexplode(split(col("text"), "\\s+")).as(Seq("pos0", "word")))
      .filter(length(col("word")) > 0)
      .select(col("doc_id"), col("word"),
        (col("pos0") + 1).cast("long").as("pos"))
      .groupBy(col("word"), col("doc_id"))
      .agg(count(lit(1)).as("n_occ"),
        array_join(array_sort(collect_list(col("pos"))), ",").as("positions"))

  private def nativeFrame(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        explode(Postings.postings(col("text"))).as("p"))
      .select(col("p.word").as("word"), col("doc_id"),
        col("p.n_occ").as("n_occ"), col("p.positions").as("positions"))

  private def assertAgree(docs: DataFrame): Unit = {
    val a = groupByFrame(docs)
    val b = nativeFrame(docs)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"formulations disagree:\nold-only=${a.exceptAll(b).collect().toSeq}" +
        s"\nnew-only=${b.exceptAll(a).collect().toSeq}")
  }

  test("agrees with the groupBy formulation on the whole sf0.01 corpus") {
    assertAgree(graft.Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"), col("text")))
  }

  test("agrees on adversarial whitespace: leading runs shift positions, unicode intact") {
    import spark.implicits._
    val cases = Seq(
      "",                       // no postings at all
      " ",                      // whitespace-only: no postings
      "\t\n\u000B\f\r ",        // every Java \s char, still empty
      "a",                      // single token at pos 1
      " a",                     // leading ws: token lands at pos 2
      "\t\r\n  a b",            // one leading RUN = one empty: a@2 b@3
      "a ",                     // trailing ws does not shift anything
      "a  b\tc\nd",             // interior runs collapse to one split
      "x x x x",                // repeats: positions 1,2,3,4
      " x y x",                 // repeat with leading shift: x@2,4 y@3
      "mixed nbsp stays one token", // U+00A0/U+2009 not \s
      "emoji 😀 pair 🎉x naïve café", // supplementary + non-ASCII
      "the\u0000null byte")
    assertAgree(cases.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"))
  }

  test("interpreted and codegen paths agree; null text drops the row in both") {
    import spark.implicits._
    // interpreted: direct compute
    val arr = Postings.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(" b a b"))
    val rows = (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3)
      (r.getUTF8String(0).toString, r.getLong(1), r.getUTF8String(2).toString)
    }
    assert(rows.toSet == Set(("b", 2L, "2,4"), ("a", 1L, "3")))
    // codegen (dataframe) path on the same string
    val viaDf = nativeFrame(Seq((1L, " b a b")).toDF("doc_id", "text"))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getString(3))).toSet
    assert(viaDf == rows.toSet)
    val withNull = nativeFrame(
      Seq((1L, Option.empty[String]), (2L, Some("x")))
        .toDF("doc_id", "text"))
    assert(withNull.select(col("doc_id")).collect().map(_.getLong(0)).toSeq == Seq(2L))
  }
}
