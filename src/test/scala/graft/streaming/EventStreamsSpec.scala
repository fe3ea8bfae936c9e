package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class EventStreamsSpec extends SparkSpec {
  import EventStreams._

  // base offset keeps every event-time strictly above the initial
  // watermark (ts == 0 is dropped by the late-row filter)
  private val Base = 99960L  // hour-aligned: 99960 = 1666 * 60
  private def ts(min: Long): Timestamp = new Timestamp((Base + min) * 60000L)

  test("micros/tsOfMicros round-trip exactly, pre-epoch included") {
    // the floor-to-second reconstruction: truncating division shifted
    // pre-1970 instants one second late (caught in round-10 review);
    // every µs value must survive ts -> micros -> ts bit-exactly
    val us = Seq(-1000001L, -1000000L, -999999L, -500000L, -1L, 0L,
      1L, 999L, 1000L, 999999L, 1000000L, 1000001L,
      1700000000000600L, Long.MaxValue / 4096)
    us.foreach { u =>
      val t = EventStreams.tsOfMicros(u)
      assert(EventStreams.micros(t) == u,
        s"round-trip broke at $u -> $t -> ${EventStreams.micros(t)}")
    }
  }

  test("watermarked hourly counts over a memory stream") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Event]
    val q = hourlyCounts(input.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode("append").start()
    input.addData(
      Event(1, ts(5), 1, "click", 1.0),
      Event(2, ts(20), 1, "click", 2.0),
      Event(3, ts(65), 2, "view", 3.0))
    q.processAllAvailable()
    // advance watermark far enough to close the first windows
    input.addData(Event(4, ts(300), 3, "click", 4.0))
    q.processAllAvailable()
    val rows = spark.table("hourly").collect()
      .map(r => (r.getTimestamp(0).getTime / 60000 - Base, r.getString(1), r.getLong(2), r.getDouble(3)))
    q.stop()
    assert(rows.toSet == Set((0L, "click", 2L, 3.0), (60L, "view", 1L, 3.0)))
  }

  test("streaming dedup drops duplicate event_ids within the watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Event]
    val q = dedupStream(input.toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    input.addData(
      Event(1, ts(1), 1, "click", 1.0),
      Event(1, ts(2), 1, "click", 1.0),   // dup id, same batch
      Event(2, ts(3), 1, "view", 2.0))
    q.processAllAvailable()
    input.addData(Event(1, ts(4), 1, "click", 1.0))  // dup id, later batch
    q.processAllAvailable()
    val ids = spark.table("dedup").collect().map(_.getLong(0)).sorted.toSeq
    q.stop()
    assert(ids == Seq(1L, 2L))
  }

  test("stream-stream interval join: purchases pick up errors in prior 30 min") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val purchases = MemoryStream[Event]
    val errors = MemoryStream[Event]
    val q = purchasesWithRecentErrors(purchases.toDF(), errors.toDF())
      .writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    errors.addData(
      Event(100, ts(10), 1, "error", 0.5),
      Event(101, ts(90), 1, "error", 0.7),   // > 30 min before purchase 2
      Event(102, ts(100), 2, "error", 0.9))  // other user
    purchases.addData(
      Event(1, ts(30), 1, "purchase", 10.0), // joins error at t=10
      Event(2, ts(130), 1, "purchase", 20.0)) // error at 90 is 40 min prior -> no
    q.processAllAvailable()
    val rows = spark.table("ssj").collect()
      .map(r => (r.getLong(0), r.getDouble(5))).toSet
    q.stop()
    assert(rows == Set((1L, 0.5)), s"got: ${rows.mkString(",")}")
  }

  test("flatMapGroupsWithState sessionization emits closed sessions") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Event]
    val q = sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    // user 1: two events 10 min apart (one session), then 40-min gap -> new session
    input.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 2.0),
      Event(3, ts(50), 1, "click", 4.0))
    q.processAllAvailable()
    // push watermark way forward so the second session times out too
    input.addData(Event(9, ts(1000), 2, "view", 0.0))
    q.processAllAvailable()
    input.addData(Event(10, ts(2000), 2, "view", 0.0))
    q.processAllAvailable()
    val rows = spark.table("sessions").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 60000 - Base, r.getInt(2), r.getDouble(3)))
    q.stop()
    assert(rows.contains((1L, 0L, 2, 3.0)), s"first session wrong: ${rows.mkString(",")}")
    assert(rows.contains((1L, 50L, 1, 4.0)), s"second session wrong: ${rows.mkString(",")}")
  }
}
