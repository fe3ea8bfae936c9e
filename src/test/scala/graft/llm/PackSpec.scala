package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PackSpec extends SparkSpec {
  import spark.implicits._

  test("distributed prefix sum equals the global-window prefix sum") {
    // ids deliberately sparse and out of order; bin width 10 forces
    // multiple bins including empty ranges between them
    val df = Seq((3L, 5), (7L, 2), (12L, 9), (35L, 1), (36L, 4), (90L, 7))
      .toDF("id", "v")
    val got = Pack.exclusivePrefixSum(df, "id", "v", "s", 10L)
      .select("id", "s").as[(Long, Long)].collect().toMap
    val w = Window.orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = df
      .withColumn("s", coalesce(sum(col("v").cast("long")).over(w), lit(0L)))
      .select("id", "s").as[(Long, Long)].collect().toMap
    assert(got == expected)
  }

  test("two-level prefix sum: many super-bins, driver collect is O(n/binWidth^2)") {
    // 1000 dense keys with binWidth 10 -> 100 level-1 bins across 10
    // super-bins; the driver must see only the 10 super-bin partials
    val df = (0L until 1000L).map(i => (i, (i % 7).toInt + 1)).toDF("id", "v")
    val got = Pack.exclusivePrefixSum(df, "id", "v", "s", 10L)
      .select("id", "s").as[(Long, Long)].collect().toMap
    val w = Window.orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = df
      .withColumn("s", coalesce(sum(col("v").cast("long")).over(w), lit(0L)))
      .select("id", "s").as[(Long, Long)].collect().toMap
    assert(got == expected)
    assert(Pack.lastDriverCollect == 10,
      s"driver collected ${Pack.lastDriverCollect} super-partials; " +
        "expected n/binWidth^2 = 10 (one-level scheme would collect 100)")
  }

  test("prefix sum of a single row and of rows in one bin") {
    val df = Seq((1L, 10), (2L, 20)).toDF("id", "v")
    val got = Pack.exclusivePrefixSum(df, "id", "v", "s", 1000L)
      .select("id", "s").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 10L))
  }

  test("a doc straddling the budget boundary packs where it starts") {
    // budget 2048: doc 0 has 2000 tokens (starts at 0 -> pack 0),
    // doc 1 has 100 (starts at 2000, straddles -> still pack 0),
    // doc 2 has 50 (starts at 2100 -> pack 1)
    val docs = Seq((0L, 2000), (1L, 100), (2L, 50)).toDF("doc_id", "n_tokens")
    val got = Pack.exclusivePrefixSum(docs, "doc_id", "n_tokens", "start_tok", 1000L)
      .withColumn("pack_id", expr("start_tok div 2048"))
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 1L))
  }

  test("pack stats on real data: packs tile the corpus in doc order") {
    val stats = Pack.packStats(spark, sf001).orderBy("pack_id").collect()
    assert(stats.nonEmpty)
    // doc ranges of consecutive packs are disjoint and increasing
    stats.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc") ||
        a.getAs[Long]("last_doc") == b.getAs[Long]("first_doc") - 1)
    }
    // every non-final pack reaches its budget only via a straddler:
    // the tokens BEFORE its last doc are < budget
    val total = stats.map(_.getAs[Long]("pack_tokens")).sum
    val nDocs = stats.map(_.getAs[Long]("n_docs")).sum
    assert(nDocs == graft.Tables.documents(spark, sf001).count())
    assert(total > 0)
  }

  test("fill histogram partitions the packs and bounds each decile's tokens") {
    val packs = Pack.packStats(spark, sf001).collect()
    val hist = Pack.packFillHistogram(spark, sf001).collect()
    assert(hist.map(_.getAs[Long]("n_packs")).sum == packs.length.toLong,
      "histogram must partition the pack set")
    hist.foreach { r =>
      val d = r.getAs[Long]("fill_decile")
      val lo = d * Pack.DefaultBudget / 10
      val hi = (d + 1) * Pack.DefaultBudget / 10
      assert(r.getAs[Long]("min_tokens") >= lo && r.getAs[Long]("max_tokens") < hi,
        s"decile $d tokens outside [$lo,$hi): $r")
    }
    // concat-and-chunk coverage: every pack except the LAST ends past
    // its upper budget boundary (its final doc straddles or lands
    // exactly on it) — under-full deciles come only from a previous
    // pack's straddler delaying this pack's first start, never from a
    // gap in the token stream.
    import org.apache.spark.sql.functions._
    val spans = Pack.packAssignments(spark, sf001)
      .groupBy(col("pack_id"))
      .agg(min(col("start_tok")).as("first_start"),
        sum(col("n_tokens")).as("tokens"))
      .orderBy(col("pack_id")).collect()
    spans.dropRight(1).foreach { r =>
      val end = r.getAs[Long]("first_start") + r.getAs[Long]("tokens")
      val bound = (r.getAs[Long]("pack_id") + 1) * Pack.DefaultBudget
      assert(end >= bound,
        s"non-final pack ${r.getAs[Long]("pack_id")} ends at $end before its boundary $bound")
    }
  }
}
