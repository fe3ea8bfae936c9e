package graft.llm

import graft.SparkSpec
import graft.functions.PqCodes
import org.apache.spark.sql.functions._

/** [[PqCodes]] must agree with the HOF formulation it replaced —
  * per-codeword `slice`+`zip_with`+`aggregate` squared-L2 with
  * first-minimum argmin — on the whole corpus (exact code equality:
  * same IEEE fold order, same tie rule), and its interpreted and
  * codegen paths must agree.
  */
class PqCodesSpec extends SparkSpec {

  private def hofCodes(e: org.apache.spark.sql.DataFrame,
      cb: Array[Array[Array[Float]]]) = {
    def sqDist(a: org.apache.spark.sql.Column, cw: Array[Float]) =
      aggregate(
        zip_with(a, array(cw.toIndexedSeq.map(lit): _*), (x, y) => {
          val d = x.cast("double") - y.cast("double"); d * d
        }),
        lit(0.0), (acc, v) => acc + v)
    e.select(col("vec_id"), array((0 until Similarity.NumSub).map { m =>
      val dists = array(cb(m).toIndexedSeq.map(cw =>
        sqDist(slice(col("embedding"), m * Similarity.SubDim + 1,
          Similarity.SubDim), cw)): _*)
      (PortableHash.bind(dists)(a => array_position(a, array_min(a))) - 1)
        .cast("int")
    }: _*).as("codes"))
  }

  test("native codes equal the HOF argmin codes on the whole sf0.01 corpus") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val cb = Similarity.pqCodebooks(e)
    val want = hofCodes(e, cb).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val got = e.select(col("vec_id"),
        PqCodes.pqCodes(col("embedding"), cb).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got.size == want.size && got.nonEmpty)
    assert(got == want)
  }

  test("interpreted compute equals the dataframe path; null embedding stays null") {
    import spark.implicits._
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cb = Similarity.pqCodebooks(e)
    val rows = e.limit(5).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val interp = rows.map { case (id, emb) =>
      id -> PqCodes.compute(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          emb.map(Float.box)), cb).toIntArray().toSeq
    }.toMap
    val viaDf = e.limit(5)
      .select(col("vec_id"), PqCodes.pqCodes(col("embedding"), cb))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(viaDf == interp)
    val nulls = Seq((1L, Option.empty[Seq[Float]])).toDF("vec_id", "embedding")
      .select(PqCodes.pqCodes(col("embedding").cast("array<float>"), cb))
      .collect()
    assert(nulls(0).isNullAt(0))
  }
}
