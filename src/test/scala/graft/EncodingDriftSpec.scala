package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Encoding-drift guard for the NON-events driver tables — the
  * generalization of [[TsEncodingDriftSpec]]'s lesson (the driver has
  * re-encoded `events.ts` twice; round 6 lost 2 queries + 6 streaming
  * tests to it). For each driver table with a plausible alternate
  * parquet encoding, this spec re-writes the REAL sf0.001 fixture
  * under that encoding and asserts representative registered queries
  * produce identical results through the [[Tables]] loaders:
  *
  *  - `documents.text` as plain BYTE_ARRAY (no UTF8 annotation →
  *    Spark BinaryType) — [[Tables.normalizeText]];
  *  - `embeddings.embedding` widened to `list<double>` —
  *    [[Tables.normalizeEmbedding]];
  *  - `orders.o_orderdate` / `lineitem.l_shipdate` as INT64 nanos —
  *    the exact events.ts hazard, now routed through
  *    [[Tables.normalizeTs]] in those loaders too.
  *
  * The next upstream regeneration of ANY of these fails here, in one
  * spec naming the drifted table, not across the driver gate.
  */
class EncodingDriftSpec extends SparkSpec {

  private val base = "/root/testdata/sf0.001"

  private val allTables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Timestamp-agnostic canonical rows (NTZ vs LTZ both oracle-legal). */
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

  /** Copy every fixture except `tableName`, which is re-encoded into
    * a single parquet FILE (the driver's layout) via `encode`.
    */
  private def writeFixture(tableName: String,
      encode: DataFrame => DataFrame): String = {
    val dir = Files.createTempDirectory(s"drift_$tableName").toString
    for (t <- allTables if t != tableName) {
      val src = Paths.get(s"$base/$t.parquet")
      if (Files.isRegularFile(src))
        Files.copy(src, Paths.get(s"$dir/$t.parquet"))
    }
    encode(spark.read.parquet(s"$base/$tableName.parquet"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_tmp")
    val part = Files.list(Paths.get(s"$dir/_tmp")).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet"))
      .getOrElse(fail("no part file written"))
    Files.move(part, Paths.get(s"$dir/$tableName.parquet"))
    Files.list(Paths.get(s"$dir/_tmp")).iterator().asScala.foreach(Files.delete)
    Files.delete(Paths.get(s"$dir/_tmp"))
    dir
  }

  private def assertParity(names: Seq[String], altDir: String,
      what: String): Unit =
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val expected = canon(fn(spark, base))
      assert(expected.nonEmpty, s"$name: empty result on the base fixture")
      val got = canon(fn(spark, altDir))
      assert(got == expected,
        s"$name drifts under $what (got ${got.size} rows vs ${expected.size})")
    }

  test("documents.text as binary: text queries are identical through Tables") {
    val dir = writeFixture("documents",
      df => df.withColumn("text", col("text").cast(BinaryType)))
    assert(spark.read.parquet(s"$dir/documents.parquet")
      .schema("text").dataType == BinaryType)
    assert(Tables.documents(spark, dir).schema("text").dataType == StringType)
    assertParity(Seq("mr_wordcount", "mr_grep", "q_llm_token_count",
      "q_llm_quality", "q_dedup_exact", "q_dedup_minhash"),
      dir, "binary text encoding")
  }

  test("embeddings as list<double>: ANN queries are identical through Tables") {
    val dir = writeFixture("embeddings",
      df => df.withColumn("embedding",
        col("embedding").cast(ArrayType(DoubleType))))
    assert(spark.read.parquet(s"$dir/embeddings.parquet")
      .schema("embedding").dataType.asInstanceOf[ArrayType]
      .elementType == DoubleType)
    assert(Tables.embeddings(spark, dir).schema("embedding")
      .dataType.asInstanceOf[ArrayType].elementType == FloatType)
    assertParity(Seq("q_ann_topk", "q_embed_centroids",
      "q_embed_semantic_dedup", "q_ann_ivf_topk"),
      dir, "double embedding encoding")
  }

  test("orders.o_orderdate as long-nanos: order queries are identical through Tables") {
    val dir = writeFixture("orders",
      df => df.withColumn("o_orderdate",
        (Tables.epochMicros(col("o_orderdate")) * 1000L).cast(LongType)))
    assert(spark.read.parquet(s"$dir/orders.parquet")
      .schema("o_orderdate").dataType == LongType)
    assert(Tables.orders(spark, dir).schema("o_orderdate")
      .dataType == TimestampType)
    assertParity(Seq("q4_order_priority", "q13_order_distribution",
      "q_window_analytics"),
      dir, "long-nanos o_orderdate encoding")
  }

  test("lineitem.l_shipdate as long-nanos: lineitem queries are identical through Tables") {
    val dir = writeFixture("lineitem",
      df => df.withColumn("l_shipdate",
        (Tables.epochMicros(col("l_shipdate")) * 1000L).cast(LongType)))
    assert(spark.read.parquet(s"$dir/lineitem.parquet")
      .schema("l_shipdate").dataType == LongType)
    assert(Tables.lineitem(spark, dir).schema("l_shipdate")
      .dataType == TimestampType)
    assertParity(Seq("q1_pricing_summary", "q6_forecast_revenue",
      "q_days_to_ship"),
      dir, "long-nanos l_shipdate encoding")
  }
}
