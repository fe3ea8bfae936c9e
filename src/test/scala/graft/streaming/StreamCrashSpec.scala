package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** Crash fidelity for the streaming exactly-once claim — the
  * [[graft.operators.MRJob]] `CrashRecoverySpec` discipline carried
  * to micro-batches: a foreachBatch sink is KILLED mid-write (after
  * it has already written a partial, corrupt batch directory), the
  * query dies, and a restart from the same checkpoint must replay
  * the batch and drain to the EXACT batch-input row set — the
  * partial output overwritten, nothing duplicated, nothing lost.
  *
  * This is the failure the `batch=<id>` overwrite layout exists for
  * (an append-mode sink would keep the partial rows AND the replay's
  * rows): at-least-once delivery + idempotent per-batch overwrite =
  * exactly-once output. The crash gate is an atomic marker-file
  * create (the [[graft.operators.JobLoaderSpec]] pattern), so the
  * replayed attempt — same batch id, same JVM — takes the clean
  * path deterministically.
  */
class StreamCrashSpec extends SparkSpec {

  test("a micro-batch killed mid-write replays from the checkpoint to the exact row set") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = Files.createTempDirectory("streamcrash").toString
    val marker = new java.io.File(s"$base/crashed.marker")
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val (wave1, wave2) = events.splitAt(events.size / 2)

    val input = MemoryStream[(Long, Long, Double)]
    def sink(batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
        id: Long): Unit = {
      if (id == 1 && marker.createNewFile()) {
        // write a PARTIAL batch dir (no overwrite-commit semantics),
        // then die before the engine records the batch as done
        batch.limit(3).write.mode("overwrite").parquet(s"$base/out/batch=$id")
        throw new RuntimeException("injected micro-batch crash (first attempt)")
      }
      batch.write.mode("overwrite").parquet(s"$base/out/batch=$id")
    }
    def start() = input.toDS().toDF("event_id", "user_id", "value")
      .writeStream.foreachBatch(sink _)
      .option("checkpointLocation", s"$base/ckpt")
      .start()

    val q1 = start()
    input.addData(wave1)
    q1.processAllAvailable()           // batch 0: clean
    input.addData(wave2)
    val died = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()         // batch 1: crashes mid-write
      q1.awaitTermination()
    }
    assert(marker.exists(), "the injected crash must have actually fired")
    assert(died.getMessage.contains("injected") ||
      Option(died.getCause).exists(_.getMessage.contains("injected")))
    // the partial corrupt output IS on disk at this point
    val partial = spark.read.parquet(s"$base/out/batch=1").count()
    assert(partial == 3, s"expected the partial write to persist, saw $partial")

    // restart from the SAME checkpoint and source: batch 1 replays,
    // its overwrite replaces the partial directory
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val drained = spark.read.parquet(s"$base/out")
      .select("event_id", "user_id", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(drained == events.toSet,
      s"missing: ${(events.toSet -- drained).take(3)}; " +
        s"extra/duplicate: ${(drained -- events.toSet).take(3)}")
    assert(drained.size == events.size, "replay duplicated or dropped rows")
  }
}
