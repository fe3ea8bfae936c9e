package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import java.nio.file.Files

class JsonLinesSpec extends SparkSpec {

  private val schema = new StructType()
    .add("doc_id", LongType).add("lang", StringType).add("n_chars", LongType)

  test("JSONL round-trip preserves every row and value") {
    val dir = Files.createTempDirectory("jsonl").toString
    val src = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    JsonLines.write(src, s"$dir/out")
    val back = JsonLines.read(spark, s"$dir/out", schema)
      .drop(JsonLines.CorruptCol)
    val a = src.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    val b = back.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    assert(a.length > 0 && a.toSeq == b.toSeq)
  }

  test("malformed lines are quarantined, not dropped or fatal") {
    val dir = Files.createTempDirectory("jsonl").toString
    val in = s"$dir/in.jsonl"
    Files.write(java.nio.file.Paths.get(in), java.util.List.of(
      """{"doc_id": 1, "lang": "en", "n_chars": 10}""",
      """this is not json at all""",
      """{"doc_id": 2, "lang": "de", "n_chars": 20}""",
      """{"doc_id": "also broken}"""))
    val (good, bad) = JsonLines.toParquet(spark, in, schema, s"$dir/pq")
    assert(good == 2 && bad == 2, s"got good=$good bad=$bad")
    // parquet readers see only the good rows (_corrupt dir is hidden
    // from discovery by its underscore prefix)
    val ids = spark.read.parquet(s"$dir/pq").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L))
    // the quarantine preserves the raw offending lines
    val kept = spark.read.text(s"$dir/pq/_corrupt").collect().map(_.getString(0))
    assert(kept.length == 2 && kept.exists(_.contains("not json")))
  }
}
