package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Oracle-style check of the sweep-line concurrency query: the
  * two-level prefix-sum decomposition must equal a single-threaded
  * driver-side sweep over the same sessionized intervals.
  */
class ConcurrencySpec extends SparkSpec {

  test("concurrency: two-level sweep matches a driver-side brute-force sweep") {
    val gapUs = 1800000000L
    val hourUs = 3600000000L
    val got = EventWindows.concurrency(spark, sf001).collect()
      .map { r =>
        val us = r.getTimestamp(0).toInstant
        val hour = us.getEpochSecond * 1000000L + us.getNano / 1000L
        hour -> ((r.getLong(1), r.getLong(2)))
      }.toMap

    // brute force: sessionize per user, sweep all boundaries in order
    val ev = graft.Tables.events(spark, sf001)
      .select(col("user_id"), graft.Tables.epochMicros(col("ts")).as("us"),
        col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val deltas = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    ev.groupBy(_._1).values.foreach { rows =>
      val ts = rows.sortBy(r => (r._2, r._3)).map(_._2)
      var start = ts.head
      var prev = ts.head
      def close(end: Long): Unit = {
        deltas(start) += 1; deltas(end + 1) -= 1
      }
      ts.tail.foreach { t =>
        if (t - prev > gapUs) { close(prev); start = t }
        prev = t
      }
      close(prev)
    }
    var cc = 0L
    val expect = scala.collection.mutable.Map[Long, (Long, Long)]()
    deltas.toSeq.sortBy(_._1)
      .groupBy { case (us, _) => us - us % hourUs }.toSeq.sortBy(_._1)
      .foreach { case (hour, bs) =>
        var maxCc = cc
        bs.sortBy(_._1).foreach { case (_, d) => cc += d; maxCc = maxCc.max(cc) }
        expect(hour) = (maxCc, cc)
      }
    assert(got.nonEmpty)
    assert(got == expect.toMap,
      s"mismatch sample: ${(got.toSet -- expect.toSet).take(3)} vs " +
        s"${(expect.toSet -- got.toSet).take(3)}")
  }

  test("concurrency: session count conservation (sum of start deltas = session count)") {
    // every session opens exactly once and closes exactly once: the
    // final carry (end_concurrency of the last hour) must be zero
    val rows = EventWindows.concurrency(spark, sf001)
      .orderBy(col("hour_start")).collect()
    assert(rows.last.getLong(2) == 0L,
      s"last hour ends with ${rows.last.getLong(2)} sessions still open")
    // and concurrency can never be negative anywhere
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(2) >= 0)
    }
  }
}
