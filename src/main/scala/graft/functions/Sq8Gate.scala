package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType}

/** SQ8 candidate pre-gate kernels for the near-dup LSH past the
  * dial's 2^18-rep branch (round-15 re-rule; BASELINE.md round-14
  * candidate-mass measurement):
  *
  *  - [[Sq8Pack]]: per-vector symmetric int8 scalar quantization of
  *    an `array<float>` embedding into a `binary(dim)` — the same
  *    floor-half-up rule as [[graft.llm.Similarity]]'s `sq8Col`
  *    (`scale = 127 / max|v_i|`, `q_i = floor(v_i·scale + 0.5)`),
  *    but 1 byte/dim instead of a numeric array, so a whole corpus's
  *    codes broadcast (64 B/vector at dim 64: ~72 MB at 1M reps,
  *    ~720 MB at 10M — map-side joinable where the float embeddings
  *    are not).
  *  - [[Sq8Cos]]: cosine of two packed codes in ONE fused integer
  *    loop (dot, na, nb as longs; one sqrt at the end). |sq8cos −
  *    cos| is < 0.02 empirically on dense embedding-like vectors
  *    (Sq8GateSpec asserts the bound on random vectors), but the
  *    STRUCTURAL worst case is 2·√dim/254 ≈ 0.063 at dim 64,
  *    approached by spike-dominated vectors whose sub-LSB tail mass
  *    all rounds away ([[graft.llm.Similarity.sq8ErrBound]];
  *    Sq8GateSpec's adversarial case exhibits it past 0.02). The
  *    gate threshold is therefore DERIVED — 0.35 − sq8ErrBound(dim)
  *    — so "the pre-gate cannot drop a pair the registered 0.35
  *    cosine gate would keep" holds for ANY input, not just
  *    corpora that resemble the empirical measurement (ADVICE r15).
  *
  * Why a gate at all: past the r-cap the LSH bucket stream is
  * λ-junk-dominated (r14: 15.3 B candidate rows at 1M reps) and the
  * junk is only MILDLY dissimilar — bucket-mates agree on r sign
  * bits, tilting their posterior mean angle to ~80°, which defeats a
  * sign-sketch (256-bit simhash keeps ~45% of junk at any threshold
  * that keeps threshold pairs). The SQ8 cosine reads magnitudes, not
  * signs: at gate 0.30 it keeps ~10% of bucket-junk (posterior
  * integral; measured by graft.CandidateMassProbe) while passing
  * every planted pair — applied map-side BEFORE the distinct, the
  * pre-gate stream never touches disk.
  *
  * Both vectors zero-norm, or a length mismatch, yield NULL (the
  * [[CosineSim]] convention — a null gate score drops the pair,
  * which a zero vector could never pass anyway).
  */
case class Sq8Pack(child: Expression, dim: Int) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sq8_pack requires array<float>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Sq8Gate.pack(input.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // freshName, not a hardcoded local: two sq8 expressions fused into
    // one codegen scope (sq8_cos(sq8_pack(a), sq8_pack(b))) would
    // otherwise declare duplicate `r`s, fail Janino, and silently fall
    // back to interpreted eval (ADVICE r15)
    val r = ctx.freshName("r")
    nullSafeCodeGen(ctx, ev, c => s"""
      |Object $r = graft.functions.Sq8Gate.pack($c, $dim);
      |if ($r == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = (byte[]) $r; }
    """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Sq8Pack =
    copy(child = newChild)
}

/** Cosine of two [[Sq8Pack]] codes — see the gate doc above. */
case class Sq8Cos(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sq8_cos requires (binary, binary), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    Sq8Gate.cos(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("r")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |Object $r = graft.functions.Sq8Gate.cos($a, $b);
      |if ($r == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = ((java.lang.Double) $r).doubleValue(); }
    """.stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Sq8Cos = copy(left = newLeft, right = newRight)
}

object Sq8Gate {

  /** floor-half-up int8 quantization; wrong-length vectors → null. */
  def pack(v: ArrayData, dim: Int): Array[Byte] = {
    if (v.numElements() != dim) return null
    var mx = 0.0
    var i = 0
    while (i < dim) {
      val a = math.abs(v.getFloat(i).toDouble)
      if (a > mx) mx = a
      i += 1
    }
    val out = new Array[Byte](dim)
    if (mx == 0.0) return out // zero vector: all-zero code, cos -> null
    val scale = 127.0 / mx
    i = 0
    while (i < dim) {
      out(i) = math.floor(v.getFloat(i).toDouble * scale + 0.5).toByte
      i += 1
    }
    out
  }

  /** One fused integer pass: dot, na, nb ≤ dim·127² — no overflow. */
  def cos(a: Array[Byte], b: Array[Byte]): java.lang.Double = {
    if (a.length != b.length) return null
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < a.length) {
      val x = a(i).toLong
      val y = b(i).toLong
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0L || nb == 0L) null
    else java.lang.Double.valueOf(
      dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)))
  }

  def sq8_pack(emb: Column, dim: Int): Column =
    Bridge.column(Sq8Pack(Bridge.expression(emb), dim))

  def sq8_cos(a: Column, b: Column): Column =
    Bridge.column(Sq8Cos(Bridge.expression(a), Bridge.expression(b)))
}
