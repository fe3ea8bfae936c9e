package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LongCountsSpec extends SparkSpec {
  import LongCounts.long_counts

  private def run(xs: Seq[Long]): Seq[(Long, Long)] = {
    import spark.implicits._
    Seq(Tuple1(xs)).toDF("xs")
      .select(explode(long_counts(col("xs"))).as("vc"))
      .select(col("vc.v"), col("vc.c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  test("sorted run-length counts, duplicates collapsed") {
    assert(run(Seq(7L, 3L, 7L, 7L, 3L, 1L)) ==
      Seq((1L, 1L), (3L, 2L), (7L, 3L)))
  }

  test("all-distinct input keeps every value at count 1, sorted") {
    assert(run(Seq(5L, 2L, 9L)) == Seq((2L, 1L), (5L, 1L), (9L, 1L)))
  }

  test("empty array yields empty counts; single run collapses fully") {
    assert(run(Nil) == Nil)
    assert(run(Seq(4L, 4L, 4L)) == Seq((4L, 3L)))
  }

  test("counts agree with the explode+groupBy formulation on random data") {
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(500)(rnd.nextInt(40).toLong)
    val expected = xs.groupBy(identity).view
      .mapValues(_.size.toLong).toSeq.sortBy(_._1)
    assert(run(xs) == expected)
  }
}
