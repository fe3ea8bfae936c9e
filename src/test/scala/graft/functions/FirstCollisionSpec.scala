package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FirstCollisionSpec extends SparkSpec {

  test("equals the HOF formulation it replaced, on real banded signatures") {
    // pair real signature rows the way the join does: every (a, b)
    // of a small corpus slice, any band
    val sigs = graft.Tables.embeddings(spark, sf001).limit(200)
      .select(col("vec_id"),
        graft.llm.Similarity.bandSignatureCols(col("embedding"), 16, 7).as("s"))
    val a = sigs.select(col("vec_id").as("va"), col("s").as("sa"))
    val b = sigs.select(col("vec_id").as("vb"), col("s").as("sb"))
    val pairs = a.crossJoin(b).filter(col("va") < col("vb"))
    val hofFirst = // index of first equality via aggregate over positions
      expr("""aggregate(sequence(0, size(sa) - 1), -1,
             |  (acc, i) -> CASE WHEN acc >= 0 THEN acc
             |                   WHEN element_at(sa, i + 1) = element_at(sb, i + 1) THEN i
             |                   ELSE -1 END)""".stripMargin)
    val diff = pairs.select(
      FirstCollision.first_collision(col("sa"), col("sb")).as("native"),
      hofFirst.as("hof"))
      .filter(not(col("native") === col("hof")))
    assert(diff.count() == 0)
    assert(pairs.count() > 0)
  }

  test("interpreted eval agrees with codegen; edges pinned") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1, 2, 3), Seq(9, 2, 3)),   // first match at 1
      (2L, Seq(1, 2, 3), Seq(1, 2, 3)),   // match at 0
      (3L, Seq(1, 2, 3), Seq(4, 5, 6)),   // no match
      (4L, Seq.empty[Int], Seq.empty[Int]))
      .toDF("id", "a", "b")
      .select(col("id"), FirstCollision.first_collision(col("a"), col("b")).as("fc"))
    val got = df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 1, 2L -> 0, 3L -> -1, 4L -> -1))
    val interp = Seq(
      (Array(1, 2, 3), Array(9, 2, 3), 1),
      (Array(1, 2, 3), Array(1, 2, 3), 0),
      (Array(1, 2, 3), Array(4, 5, 6), -1),
      (Array[Int](), Array[Int](), -1))
    interp.foreach { case (a, b, want) =>
      assert(FirstCollision.compute(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(a),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(b)) == want)
    }
  }
}
