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

  test("native LUTs equal the HOF fixdot tables on the whole sf0.01 corpus") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val cb = Similarity.pqCodebooks(e)
    val q30 = 1L << 30
    // the exact HOF formulation pqTopK used before the PqLuts kernel
    def fixdot(sub: org.apache.spark.sql.Column, cw: Array[Float]) =
      floor(aggregate(
        zip_with(sub, array(cw.toIndexedSeq.map(lit): _*),
          (x, g) => x.cast("double") * g.cast("double")),
        lit(0.0), (acc, v) => acc + v) * q30 + lit(0.5)).cast("long")
    val want = e.select(col("vec_id") +:
        (0 until Similarity.NumSub).map { m =>
          array(cb(m).toIndexedSeq.map(cw =>
            fixdot(slice(col("embedding"), m * Similarity.SubDim + 1,
              Similarity.SubDim), cw)): _*).as(s"lut$m")
        }: _*)
      .collect()
      .map(r => r.getLong(0) ->
        (1 to Similarity.NumSub).map(r.getSeq[Long](_).toSeq)).toMap
    val got = e.select(col("vec_id"),
        graft.functions.PqLuts.pqLuts(col("embedding"), cb).as("luts"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[scala.collection.Seq[Long]](1).toSeq.map(_.toSeq)).toMap
    assert(got.size == want.size && got.nonEmpty)
    assert(got == want)
    // null embedding stays null
    import spark.implicits._
    val nulls = Seq((1L, Option.empty[Seq[Float]])).toDF("vec_id", "embedding")
      .select(graft.functions.PqLuts.pqLuts(
        col("embedding").cast("array<float>"), cb))
      .collect()
    assert(nulls(0).isNullAt(0))
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
