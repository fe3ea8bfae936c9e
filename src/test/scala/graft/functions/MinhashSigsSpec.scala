package graft.functions

import graft.SparkSpec
import graft.llm.PortableHash
import org.apache.spark.sql.functions._

class MinhashSigsSpec extends SparkSpec {

  /** The nested-HOF formulation the native expression replaced —
    * kept as the equivalence oracle.
    */
  private def hofMhs(sh: org.apache.spark.sql.Column) =
    PortableHash.bind(
      transform(sh, s => PortableHash.h60(s).bitwiseAND(lit(0x7fffffffL)))) { hv =>
      transform(sequence(lit(0), lit(15)),
        i => array_min(transform(hv, h => PortableHash.minhashMix(h, i))))
    }

  test("native minhash_sigs equals the HOF formulation on real shingle arrays") {
    // build 3-gram shingle arrays the same way Dedup does
    val sh = PortableHash.bind(graft.llm.TextAnalysis.tokensCol) { ws =>
      array_distinct(
        when(size(ws) >= 3,
          transform(sequence(lit(1), size(ws) - 2),
            i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1),
              element_at(ws, i + 2))))
          .otherwise(array(concat_ws(" ", ws))))
    }
    val df = graft.Tables.documents(spark, sf001)
      .select(MinhashSigs.minhash_sigs(sh).as("native"), hofMhs(sh).as("hof"))
    assert(df.filter(not(col("native") === col("hof"))).count() == 0)
    assert(df.count() > 0)
  }

  test("signature properties: 16 members, range [0, 2^31), permutation-stable") {
    import spark.implicits._
    val df = Seq(
      Seq("a b c", "b c d", "c d e"),
      Seq("c d e", "a b c", "b c d"),  // same set, different order
      Seq("x y z"))
      .toDF("sh").select(MinhashSigs.minhash_sigs(col("sh")).as("mhs"))
    val rows = df.collect().map(_.getSeq[Long](0))
    rows.foreach { s =>
      assert(s.length == 16)
      assert(s.forall(v => v >= 0 && v < 2147483647L))
    }
    assert(rows(0) == rows(1), "minhash must not depend on shingle order")
    assert(rows(0) != rows(2))
  }

  test("empty or all-null shingle arrays yield null, not a colliding sentinel") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq.empty[String])),
      (2L, None),
      (3L, Some(Seq("a b c"))))
      .toDF("id", "sh")
      .select(col("id"), MinhashSigs.minhash_sigs(col("sh")).as("mhs"))
    val got = df.collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(got(1L) && got(2L) && !got(3L))
  }

  test("minhash_sigs is registered in the SQL function registry") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql("SELECT minhash_sigs(array('a b c')) AS s")
      .collect().head.getSeq[Long](0)
    assert(r.length == 16)
  }
}
