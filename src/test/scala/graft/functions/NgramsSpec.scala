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

  test("chunks equals the HOF stride/slice formulation on real tokens") {
    val ws = graft.llm.TextAnalysis.tokensCol
    val hof = graft.llm.PortableHash.bind(ws) { w =>
      transform(
        sequence(lit(0), greatest(ceil((size(w) - 32) / lit(24.0)).cast("int"), lit(0))),
        i => concat_ws(" ", slice(w, i * 24 + lit(1), lit(32))))
    }
    val df = graft.Tables.documents(spark, sf001)
      .select(Chunks.chunks(ws, 32, 24).as("native"), hof.as("hof"))
    assert(df.filter(not(col("native") === col("hof"))).count() == 0)
    assert(df.count() > 0)
  }

  test("chunks edge cases: empty array -> one empty chunk, exact-size -> one chunk") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq.empty[String]),
      (2L, (1 to 32).map(_.toString)),
      (3L, (1 to 33).map(_.toString)))
      .toDF("id", "toks")
      .select(col("id"), Chunks.chunks(col("toks"), 32, 24).as("c"))
    val got = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq(""))
    assert(got(2L).length == 1)
    assert(got(3L).length == 2 && got(3L)(1) == (25 to 33).map(_.toString).mkString(" "))
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
