package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Behavior of the streaming signature dedup beyond batch parity
  * (which StreamBatchParitySpec owns): the event-time TTL storage
  * bound. Event time makes the test deterministic — eviction is
  * driven by the watermark, which the test advances with explicit
  * timestamps, never by wall-clock sleeps.
  */
class DocStreamsSpec extends SparkSpec {

  private val text = "the same document text repeated across distant points of the stream"
  private val other = "a completely different filler document advancing the stream clock"

  // well above epoch: the initial watermark is 0 and the stateful
  // operator's late-row filter drops rows with ts <= watermark
  private def ts(minutes: Long): java.sql.Timestamp =
    new java.sql.Timestamp(1_700_000_000_000L + minutes * 60000L)

  test("event-time TTL: in-window duplicates suppressed, evicted ones re-admitted") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = DocStreams
      .minhashDedupStreamTtl(input.toDS().toDF("doc_id", "text", "ts"),
        ttl = java.time.Duration.ofHours(1), watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("docdedup_ttl")
      .outputMode("append").start()
    def kept(): Seq[Long] =
      spark.table("docdedup_ttl").collect().map(_.getLong(0)).sorted.toSeq

    input.addData((1L, text, ts(0)))
    q.processAllAvailable()
    assert(kept() == Seq(1L))
    // 30 min later — within the 1 h TTL: suppressed (and the TTL
    // clock refreshes to 01:30)
    input.addData((2L, text, ts(30)))
    q.processAllAvailable()
    assert(kept() == Seq(1L), "duplicate within the TTL must be suppressed")
    // unrelated doc at 04:00 pushes the watermark past the 01:30
    // expiry; the idle signature's timeout fires and evicts it
    input.addData((3L, other, ts(240)))
    q.processAllAvailable()
    assert(kept() == Seq(1L, 3L))
    // the same text at 04:30 — after eviction: re-admitted (the
    // documented recall/storage trade of bounding state)
    input.addData((4L, text, ts(270)))
    q.processAllAvailable()
    assert(kept() == Seq(1L, 3L, 4L), "a duplicate after eviction must be re-admitted")
    q.stop()
  }
}
