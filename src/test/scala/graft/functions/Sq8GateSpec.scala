package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The SQ8 candidate pre-gate kernels ([[Sq8Gate]]) — the r15
  * near-dup re-rule's junk filter. The load-bearing property is the
  * ERROR BOUND: the pre-gate may never drop a pair the 0.35 cosine
  * gate would keep. The margin is the structural worst case
  * `sq8ErrBound(dim)` = 2√dim/254 (tau = 0.35 − it), NOT the
  * empirical < 0.02 — spike-dominated vectors exceed the empirical
  * figure (the adversarial test below), and a margin sized to it
  * would silently lose true pairs on skewed corpora (ADVICE r15).
  */
class Sq8GateSpec extends SparkSpec {
  import graft.llm.Similarity.Dim

  private def floatsOf(seed: Long): Array[Float] = {
    val rnd = new java.util.Random(seed)
    Array.fill(Dim)((rnd.nextDouble() * 2 - 1).toFloat)
  }

  test("sq8_cos tracks exact cosine within 0.02 across random vectors") {
    import spark.implicits._
    val rows = (0 until 500).map { i =>
      (floatsOf(i), floatsOf(i + 1000))
    }.toDF("a", "b")
      .select(col("a").cast("array<float>").as("a"),
        col("b").cast("array<float>").as("b"))
    val scored = rows.select(
      graft.functions.CosineSim.cosine_sim(col("a"), col("b")).as("cos"),
      Sq8Gate.sq8_cos(Sq8Gate.sq8_pack(col("a"), Dim),
        Sq8Gate.sq8_pack(col("b"), Dim)).as("gcos"))
      .collect()
    assert(scored.length == 500)
    val worst = scored.map(r => math.abs(r.getDouble(0) - r.getDouble(1))).max
    assert(worst < 0.02, s"sq8 quantization error $worst breaches the bound")
  }

  test("spiky vectors: error exceeds the empirical 0.02 but the DERIVED tau still keeps true pairs") {
    // ADVICE r15: the 0.02 bound above is EMPIRICAL (dense random
    // vectors). A spike-dominated vector — one unit component plus a
    // sub-half-LSB tail — loses its entire tail to quantization, and
    // when that tail aligns with the other vector's bulk the cosine
    // error reaches ~√dim/254 per spiky side (0.031 at dim 64; the
    // two-sided structural worst case is sq8ErrBound = 2√dim/254 =
    // 0.063, past the old fixed 0.30 tau's 0.05 margin). The gate
    // threshold is therefore derived as 0.35 − sq8ErrBound(dim), and
    // this test pins both halves: the adversarial error really does
    // exceed the empirical bound, and a true pair (cos ≥ 0.35) still
    // clears the derived tau even on these vectors.
    import spark.implicits._
    import graft.llm.Similarity
    val eps = 0.0039f // < (1/254) of the unit spike: rounds to zero
    val spread = (1.0 / math.sqrt((Dim - 1).toDouble)).toFloat
    // a: unit spike + sub-LSB tail (all tail mass quantizes away)
    val a = Array.tabulate(Dim)(i => if (i == 0) 1.0f else eps)
    // b: accurate-quantizing bulk on the tail axes + a spike-axis
    // component sized so the TRUE cosine sits just above the 0.35
    // scoring gate while the quantized one dips by the lost tail dot
    val b = Array.tabulate(Dim)(i => if (i == 0) 0.38f else spread)
    val row = Seq((a, b)).toDF("a", "b")
      .select(col("a").cast("array<float>").as("a"),
        col("b").cast("array<float>").as("b"))
      .select(
        graft.functions.CosineSim.cosine_sim(col("a"), col("b")).as("cos"),
        Sq8Gate.sq8_cos(Sq8Gate.sq8_pack(col("a"), Dim),
          Sq8Gate.sq8_pack(col("b"), Dim)).as("gcos"))
      .head()
    val (cos, gcos) = (row.getDouble(0), row.getDouble(1))
    assert(cos >= 0.35, s"construction drifted: true cos $cos is not a true pair")
    val err = cos - gcos
    assert(err > 0.02,
      f"adversarial construction no longer exceeds the empirical bound: err=$err%.4f")
    assert(err <= Similarity.sq8ErrBound(Dim) + 1e-9,
      f"error $err%.4f breaches the structural bound ${Similarity.sq8ErrBound(Dim)}%.4f")
    assert(gcos >= Similarity.NearDupGateTau,
      f"derived tau ${Similarity.NearDupGateTau}%.4f dropped a true pair (gcos=$gcos%.4f)")
    // and the margin is exactly the structural bound, so the keep
    // invariant is arithmetic, not luck: cos ≥ 0.35 ⇒ gcos ≥ tau
    assert(math.abs((0.35 - Similarity.NearDupGateTau) -
      Similarity.sq8ErrBound(Dim)) < 1e-12)
  }

  test("pack matches the HOF sq8 rule (floor half-up, scale 127/max)") {
    import spark.implicits._
    val v = floatsOf(7)
    val packed = Seq(Tuple1(v)).toDF("a")
      .select(col("a").cast("array<float>").as("a"))
      .select(Sq8Gate.sq8_pack(col("a"), Dim)).head().getAs[Array[Byte]](0)
    val mx = v.map(x => math.abs(x.toDouble)).max
    val scale = 127.0 / mx
    val want = v.map(x => math.floor(x.toDouble * scale + 0.5).toByte)
    assert(packed.toSeq == want.toSeq)
    assert(packed.exists(_ == 127.toByte) || packed.exists(_ == -127.toByte),
      "the max-magnitude component must quantize to ±127")
  }

  test("degenerate inputs: wrong length and zero vectors go null") {
    import spark.implicits._
    val df = Seq(
      (Array.fill(Dim)(1.0f), Array.fill(3)(1.0f)), // wrong length b
      (Array.fill(Dim)(0.0f), Array.fill(Dim)(1.0f)) // zero norm a
    ).toDF("a", "b")
      .select(col("a").cast("array<float>").as("a"),
        col("b").cast("array<float>").as("b"))
    val out = df.select(
      Sq8Gate.sq8_cos(Sq8Gate.sq8_pack(col("a"), Dim),
        Sq8Gate.sq8_pack(col("b"), Dim)).as("g")).collect()
    assert(out.forall(_.isNullAt(0)),
      "wrong-length packs and zero-norm codes must score null")
  }

  test("gated multiprobe equals ungated at spec scale (all true pairs pass)") {
    // at sf0.001 every LSH pair's cosine is >= 0.35 by the final
    // gate; the SQ8 pre-gate at 0.30 sits 0.05 under it with < 0.02
    // error, so gating must not change the pair set — the structural
    // reason registered-corpus hashes cannot move even if the gate
    // were (wrongly) enabled below the branch
    import graft.llm.Similarity
    val emb = graft.Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("embedding"))
    val ungated = Similarity.nearDupWithDupCollapse(emb, 16, 8, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gated = Similarity.nearDupWithDupCollapse(emb, 16, 8, 2,
      gate = Some(Similarity.NearDupGateTau))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gated == ungated,
      s"gate changed the pair set: only-ungated=${(ungated -- gated).take(5)}")
  }
}
