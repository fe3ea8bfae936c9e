package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimhashSpec extends SparkSpec {

  /** The interpreted higher-order-function formulation the native
    * expression replaced — kept here as the equivalence oracle.
    */
  private val hofSimhash = expr(
    """element_at(transform(array(
      |    filter(split(text, '\\s+'), w -> length(w) > 0)), ws ->
      |  element_at(transform(array(
      |      transform(ws, w -> CAST(conv(substring(md5(concat(w, '#sim')), 1, 15), 16, 10) AS BIGINT))), hs ->
      |    aggregate(
      |      transform(sequence(0, 59), b ->
      |        CASE WHEN aggregate(hs, 0, (acc, h) ->
      |                 acc + (CASE WHEN (shiftright(h, b) & 1) = 1 THEN 1 ELSE -1 END)) > 0
      |             THEN shiftleft(CAST(1 AS BIGINT), b) ELSE CAST(0 AS BIGINT) END),
      |      CAST(0 AS BIGINT), (acc, v) -> acc + v)), 1)), 1)""".stripMargin)

  test("native simhash equals the HOF formulation on every sf0.001 document") {
    val df = graft.Tables.documents(spark, sf001)
      .select(
        Simhash.simhash(graft.llm.TextAnalysis.tokensCol).as("native"),
        hofSimhash.as("hof"))
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
    assert(df.count() > 0)
  }

  test("edge cases: empty array -> 0, null array -> null, multiplicity votes") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq.empty[String])),
      (2L, None),
      (3L, Some(Seq("a", "a", "b"))),  // 'a' outvotes 'b' 2:1 on every bit
      (4L, Some(Seq("a"))))
      .toDF("id", "toks")
    val got = df.select(col("id"), Simhash.simhash(col("toks")).as("s"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(1L).contains(0L))       // no votes -> no bit positive
    assert(got(2L).isEmpty)
    assert(got(3L) == got(4L))         // majority token dominates alone
  }

  test("simhash is registered in the SQL function registry") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT simhash(array('hello', 'world')) AS s").collect().head.getLong(0)
    val e = spark.range(1)
      .select(Simhash.simhash(array(lit("hello"), lit("world"))))
      .collect().head.getLong(0)
    assert(r == e)
  }
}
