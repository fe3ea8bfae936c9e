package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NgramsSpec extends SparkSpec {

  test("ngrams equals the HOF slice/concat_ws formulation on real tokens") {
    val ws = graft.llm.TextAnalysis.tokensCol
    for (n <- Seq(3, 5)) {
      val hof = graft.llm.PortableHash.bind(ws) { w =>
        when(size(w) >= n,
          transform(sequence(lit(1), size(w) - (n - 1)),
            i => concat_ws(" ", slice(w, i, lit(n)))))
          .otherwise(array().cast("array<string>"))
      }
      val df = graft.Tables.documents(spark, sf001)
        .select(Ngrams.ngrams(ws, n).as("native"), hof.as("hof"))
      assert(df.filter(not(col("native") === col("hof"))).count() == 0,
        s"mismatch at n=$n")
      assert(df.count() > 0)
    }
  }

  test("edge cases: short arrays empty, n=1 identity, null array null") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq("a", "b"))),
      (2L, Some(Seq("a", "b", "c"))),
      (3L, None),
      (4L, Some(Seq.empty[String])))
      .toDF("id", "toks")
    val g3 = df.select(col("id"), Ngrams.ngrams(col("toks"), 3).as("g"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[String](1))).toMap
    assert(g3(1L) == Seq.empty)
    assert(g3(2L) == Seq("a b c"))
    assert(g3(3L) == null)
    assert(g3(4L) == Seq.empty)
    val g1 = df.filter(col("id") === 2L)
      .select(Ngrams.ngrams(col("toks"), 1)).collect().head.getSeq[String](0)
    assert(g1 == Seq("a", "b", "c"))
  }
}
