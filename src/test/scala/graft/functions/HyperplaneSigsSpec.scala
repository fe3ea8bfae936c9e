package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HyperplaneSigsSpec extends SparkSpec {

  test("native hyperplane_sigs equals the HOF formulation on real embeddings") {
    val df = graft.Tables.embeddings(spark, sf001)
      .select(
        HyperplaneSigs.hyperplane_sigs(col("embedding"), 16, 8, 64).as("native"),
        graft.llm.Similarity.bandSignatureColsHof(col("embedding"), 16, 8).as("hof"))
    assert(df.filter(not(col("native") === col("hof"))).count() == 0)
    assert(df.count() > 0)
  }

  test("interpreted eval agrees with codegen") {
    val df = graft.Tables.embeddings(spark, sf001).limit(50)
    val codegen = df
      .select(HyperplaneSigs.hyperplane_sigs(col("embedding"), 4, 8, 64))
      .collect().map(_.getSeq[Int](0))
    val interpreted = df.collect().map { r =>
      val v = r.getSeq[Float](r.fieldIndex("embedding"))
      HyperplaneSigs.compute(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(v.toArray),
        4, 8, 64).toIntArray().toSeq
    }
    assert(codegen.map(_.toSeq).toSeq == interpreted.map(_.toSeq).toSeq)
  }

  test("band independence and bit range; wrong-length vectors yield null") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq.fill(64)(0.5f)),
      (2L, Seq.fill(63)(0.5f)),
      (3L, Seq.empty[Float]))
      .toDF("id", "v")
      .select(col("id"),
        HyperplaneSigs.hyperplane_sigs(col("v"), 16, 8, 64).as("sigs"))
    val rows = df.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getSeq[Int](1)))).toMap
    assert(rows(2L).isEmpty && rows(3L).isEmpty,
      "length-mismatched vectors must surface as null, not a sentinel bucket")
    val sigs = rows(1L).get
    assert(sigs.length == 16)
    assert(sigs.forall(b => b >= 0 && b < 256))
    // 16 independent 8-bit shots of a fixed vector should not all
    // land in one bucket value (they share the vector, not the planes)
    assert(sigs.distinct.length > 1)
  }
}
