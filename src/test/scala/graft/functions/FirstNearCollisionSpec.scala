package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FirstNearCollisionSpec extends SparkSpec {

  test("equals the HOF bitcount formulation on real banded signatures") {
    val sigs = graft.Tables.embeddings(spark, sf001).limit(200)
      .select(col("vec_id"),
        graft.llm.Similarity.bandSignatureCols(col("embedding"), 16, 7).as("s"))
    val a = sigs.select(col("vec_id").as("va"), col("s").as("sa"))
    val b = sigs.select(col("vec_id").as("vb"), col("s").as("sb"))
    val pairs = a.crossJoin(b).filter(col("va") < col("vb"))
    val hofFirst = // first index with popcount(xor) <= 1 via aggregate
      expr("""aggregate(sequence(0, size(sa) - 1), -1,
             |  (acc, i) -> CASE WHEN acc >= 0 THEN acc
             |                   WHEN bit_count(element_at(sa, i + 1) ^ element_at(sb, i + 1)) <= 1 THEN i
             |                   ELSE -1 END)""".stripMargin)
    val diff = pairs.select(
      FirstNearCollision.first_near_collision(col("sa"), col("sb"), 1).as("native"),
      hofFirst.cast("int").as("hof"))
      .filter(not(col("native") === col("hof")))
    assert(diff.count() == 0)
    assert(pairs.count() > 0)
  }

  test("interpreted eval agrees with codegen; maxBits edges pinned") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1, 2, 3), Seq(14, 2, 3)),  // dist(1^14)=4 > 1; exact at 1
      (2L, Seq(0, 2, 3), Seq(1, 2, 3)),   // one bit off at 0
      (3L, Seq(0, 12, 3), Seq(3, 8, 3)),  // dist 2, dist 1 -> 1
      (4L, Seq(5, 5), Seq(10, 0)),        // dist 4, dist 2 -> none
      (5L, Seq.empty[Int], Seq.empty[Int]))
      .toDF("id", "a", "b")
      .select(col("id"),
        FirstNearCollision.first_near_collision(col("a"), col("b"), 1).as("fc"))
    val got = df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 1, 2L -> 0, 3L -> 1, 4L -> -1, 5L -> -1))
    // maxBits = 0 degenerates to FirstCollision exactly
    val fixtures = Seq(
      (Array(1, 2, 3), Array(9, 2, 3)),
      (Array(1, 2, 3), Array(1, 2, 3)),
      (Array(1, 2, 3), Array(4, 5, 6)),
      (Array(0, 12, 3), Array(3, 8, 3)),
      (Array[Int](), Array[Int]()))
    fixtures.foreach { case (a, b) =>
      val ga = new org.apache.spark.sql.catalyst.util.GenericArrayData(a)
      val gb = new org.apache.spark.sql.catalyst.util.GenericArrayData(b)
      assert(FirstNearCollision.compute(ga, gb, 0) ==
        FirstCollision.compute(ga, gb))
    }
    // interpreted path matches the codegen results above
    val interp = Seq(
      (Array(1, 2, 3), Array(14, 2, 3), 1),
      (Array(0, 2, 3), Array(1, 2, 3), 0),
      (Array(0, 12, 3), Array(3, 8, 3), 1),
      (Array(5, 5), Array(10, 0), -1),
      (Array[Int](), Array[Int](), -1))
    interp.foreach { case (a, b, want) =>
      assert(FirstNearCollision.compute(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(a),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(b), 1) == want)
    }
  }
}
