package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import scala.jdk.CollectionConverters._

/** Schema-drift guard for `events.ts`. The driver has regenerated the
  * test parquet with three different ts encodings across rounds —
  * INT64 nanos (rounds ≤5), `timestamp[us]` naive → TIMESTAMP_NTZ
  * (round 6, which broke 2 queries and 6 streaming tests at once) —
  * and plain TIMESTAMP is the obvious third. This spec re-writes the
  * real sf0.001 events fixture under ALL THREE encodings and asserts
  * every events-family query (batch AND the streaming hourly twin)
  * produces the identical result set on each. The next upstream
  * re-encoding must fail HERE, in one place, not across the driver
  * gate.
  */
class TsEncodingDriftSpec extends SparkSpec {

  private val base = "/root/testdata/sf0.001"

  // every registered query that reads Tables.events (incl. the graph
  // family, which builds click edges from events)
  private val eventQueries: Seq[String] =
    (SparkEntry.queries.keys.filter(n =>
        n.startsWith("q_events_") || n.startsWith("q_graph_")).toSeq ++
      Seq("q_range_join", "q_interval_overlap", "q_asof_join",
        "q_asof_forward", "q_salted_count", "q_profile",
        "q_cdc_latest", "q_cdc_upsert", "q_cdc_diff", "q_partitioned_sink"))
      .distinct.sorted

  /** Rows rendered encoding-agnostically: any timestamp-ish column is
    * reduced to epoch micros before collect, so NTZ vs LTZ output
    * schemas (both oracle-legal) compare equal.
    */
  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case TimestampType | TimestampNTZType =>
          Tables.epochMicros(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*).collect().map(_.toString).sorted.toSeq
  }

  private def writeFixture(encode: DataFrame => DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("tsdrift").toString
    // copy the sibling tables untouched (several queries join them)
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings")) {
      val src = java.nio.file.Paths.get(s"$base/$t.parquet")
      if (java.nio.file.Files.isRegularFile(src))
        java.nio.file.Files.copy(src, java.nio.file.Paths.get(s"$dir/$t.parquet"))
    }
    // the driver ships events.parquet as a single FILE (and the
    // streaming glob expects that), so unwrap Spark's directory write
    encode(spark.read.parquet(s"$base/events.parquet"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_ev_tmp")
    val part = Files.list(Paths.get(s"$dir/_ev_tmp")).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet"))
      .getOrElse(fail("no part file written"))
    Files.move(part, Paths.get(s"$dir/events.parquet"))
    Files.list(Paths.get(s"$dir/_ev_tmp")).iterator().asScala.foreach(Files.delete)
    Files.delete(Paths.get(s"$dir/_ev_tmp"))
    dir
  }

  // the on-disk fixture is NTZ today; derive the other two from it.
  // Shared across both tests (each writeFixture copies 9 sibling
  // tables — no need to do that six times).
  private lazy val ntzDir = writeFixture(identity)
  private lazy val ltzDir = writeFixture(df =>
    df.withColumn("ts", col("ts").cast(TimestampType)))
  private lazy val nanosDir = writeFixture(df =>
    df.withColumn("ts", (Tables.epochMicros(col("ts")) * 1000L).cast(LongType)))

  test("every events query is identical under NTZ, LTZ, and long-nanos ts") {
    // sanity: the three fixtures really carry three distinct types
    assert(Tables.table(spark, ntzDir, "events").schema("ts").dataType == TimestampNTZType)
    assert(Tables.table(spark, ltzDir, "events").schema("ts").dataType == TimestampType)
    assert(Tables.table(spark, nanosDir, "events").schema("ts").dataType == LongType)

    assert(eventQueries.size >= 15, s"query list shrank: $eventQueries")
    for (name <- eventQueries) {
      val fn = SparkEntry.queries(name)
      val expected = canon(fn(spark, ntzDir))
      assert(expected.nonEmpty, s"$name: empty result on the base fixture")
      for ((enc, dir) <- Seq("LTZ" -> ltzDir, "long-nanos" -> nanosDir)) {
        val got = canon(fn(spark, dir))
        assert(got == expected,
          s"$name drifts under $enc ts encoding " +
            s"(got ${got.size} rows vs ${expected.size})")
      }
    }
  }

  test("streaming hourly twin runs and agrees under all three encodings") {
    import graft.streaming.EventStreams
    def run(dir: String, tag: String): Seq[String] = {
      val q = EventStreams.hourlyCounts(EventStreams.eventsFileStream(spark, dir))
        .writeStream.format("memory").queryName(s"tsdrift_$tag")
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      canon(spark.table(s"tsdrift_$tag"))
    }
    val expected = run(ntzDir, "ntz")
    assert(expected.nonEmpty)
    assert(run(ltzDir, "ltz") == expected, "LTZ stream drifts")
    assert(run(nanosDir, "nanos") == expected, "long-nanos stream drifts")
  }
}
