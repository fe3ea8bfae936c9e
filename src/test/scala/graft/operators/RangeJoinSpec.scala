package graft.operators

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // points: (key, p); intervals: (key, lo, hi). binWidth 10.
  private lazy val points = Seq(
    ("a", 5L), ("a", 10L), ("a", 19L), ("a", 25L),
    ("b", 5L), ("c", 99L)).toDF("k", "p")
  private lazy val intervals = Seq(
    ("a", 0L, 9L),    // single bin
    ("a", 8L, 22L),   // spans bins 0,1,2 — catches 10 and 19
    ("a", 19L, 19L),  // degenerate single-point interval
    ("b", 6L, 7L),    // same bin as b's point but misses it
    ("d", 0L, 100L)). // key with no points
    toDF("k", "lo", "hi")

  private lazy val result =
    RangeJoin.pointInInterval(points, intervals, "k", "p", "lo", "hi", 10L)
      .select("k", "p", "lo", "hi").as[(String, Long, Long, Long)]
      .collect().toList

  test("finds exactly the containing intervals, bounds inclusive") {
    assert(result.toSet == Set(
      ("a", 5L, 0L, 9L),
      ("a", 10L, 8L, 22L),
      ("a", 19L, 8L, 22L),
      ("a", 19L, 19L, 19L)))
  }

  test("no duplicate pairs from multi-bin intervals (point in one bin)") {
    assert(result.size == result.toSet.size)
  }

  test("physical plan is a real join, not a nested loop") {
    val phys = RangeJoin.pointInInterval(
      points, intervals, "k", "p", "lo", "hi", 10L)
      .queryExecution.executedPlan.toString
    assert(!phys.contains("BroadcastNestedLoopJoin") &&
      !phys.contains("CartesianProduct"))
  }
}
