package graft.functions

import graft.SparkSpec
import graft.llm.PortableHash.h60
import org.apache.spark.sql.functions._

class H60Spec extends SparkSpec {

  test("fused H60 == conv(substr(md5,1,15),16,10) on real corpus text") {
    val tokens = graft.jobs.CanonicalJobs.tokens(spark, sf001).limit(5000)
    val diff = tokens
      .withColumn("fast", h60(col("word")))
      .withColumn("ref", conv(substring(md5(col("word")), 1, 15), 16, 10).cast("long"))
      .filter(col("fast") =!= col("ref"))
      .count()
    assert(diff == 0L)
  }

  test("H60 handles empty string, unicode, null") {
    import spark.implicits._
    val df = Seq(Some(""), Some("héllo wörld ñ"), None).toDF("s")
    val rows = df.select(h60(col("s"))).collect()
    // md5("") = d41d8cd98f00b204..., first 15 hex
    assert(rows(0).getLong(0) == java.lang.Long.parseLong("d41d8cd98f00b20", 16))
    assert(rows(1).getLong(0) > 0)
    assert(rows(2).isNullAt(0))
  }
}
