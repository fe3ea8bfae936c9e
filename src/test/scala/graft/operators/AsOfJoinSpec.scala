package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  test("asof: latest at-or-before match, inclusive ties, null when none") {
    import spark.implicits._
    val left = Seq((1, 10, "L10"), (1, 20, "L20"), (1, 5, "L5"), (2, 15, "L15"))
      .toDF("k", "t", "lv")
    val right = Seq((1, 7, "R7"), (1, 20, "R20"), (2, 99, "R99"))
      .toDF("k", "rt", "rv")
    val got = AsOfJoin.asof(left, right, "k", "t", "rt").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getInt(3),
        if (r.isNullAt(4)) null else r.getString(4))).toSet
    assert(got == Set(
      (1, 5, "L5", null, null),          // nothing at or before t=5
      (1, 10, "L10", 7, "R7"),           // latest <= 10 is 7
      (1, 20, "L20", 20, "R20"),         // tie at t=20 is inclusive
      (2, 15, "L15", null, null)))       // right row is after
  }

  test("asof result matches left row count exactly") {
    import spark.implicits._
    val left = Seq((1, 1, "a"), (1, 2, "b"), (1, 3, "c")).toDF("k", "t", "lv")
    val right = Seq((1, 1, "x"), (1, 1, "y")).toDF("k", "rt", "rv")
    // duplicate right timestamps: exactly one row per left row survives
    assert(AsOfJoin.asof(left, right, "k", "t", "rt").count() == 3)
  }

  test("asofForward: earliest at-or-after match, inclusive ties, null when none") {
    import spark.implicits._
    val left = Seq((1, 10, "L10"), (1, 20, "L20"), (1, 25, "L25"), (2, 15, "L15"))
      .toDF("k", "t", "lv")
    val right = Seq((1, 12, "R12"), (1, 20, "R20"), (2, 3, "R3"))
      .toDF("k", "rt", "rv")
    val got = AsOfJoin.asofForward(left, right, "k", "t", "rt").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getInt(3),
        if (r.isNullAt(4)) null else r.getString(4))).toSet
    assert(got == Set(
      (1, 10, "L10", 12, "R12"),         // earliest >= 10 is 12, not 20
      (1, 20, "L20", 20, "R20"),         // tie at t=20 is inclusive
      (1, 25, "L25", null, null),        // nothing at or after t=25
      (2, 15, "L15", null, null)))       // right row is before
  }

  test("asofForward tolerance: matches beyond the horizon are nulled, not shifted") {
    import spark.implicits._
    // int times cast to timestamps as SECONDS; tolerance is micros
    val left = Seq((1, 10, "a"), (1, 95, "b")).toDF("k", "t", "lv")
    val right = Seq((1, 14, "near"), (1, 200, "far")).toDF("k", "rt", "rv")
    val got = AsOfJoin.asofForward(left, right, "k", "t", "rt",
        toleranceMicros = 5L * 1000000)  // 5 seconds
      .collect()
      .map(r => (r.getInt(1), if (r.isNullAt(4)) null else r.getString(4))).toSet
    // t=10 -> rt=14 within 5s; t=95 -> nearest is rt=200, 105s away:
    // NULL (the far row must not be replaced by an earlier one)
    assert(got == Set((10, "near"), (95, null)))
    // left row count preserved
    assert(AsOfJoin.asofForward(left, right, "k", "t", "rt").count() == 2)
  }
}
