package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Index of the FIRST position where two `array<int>` signature lists
  * are within `maxBits` Hamming distance (−1 if none) — the
  * canonical-band dedup predicate of the MULTI-PROBE near-dup join:
  * with one-bit probing a pair is a candidate in every band whose
  * signatures differ by ≤1 bit, and
  * `first_near_collision(sigs_a, sigs_b, 1) = band` keeps it only in
  * the earliest such band. [[FirstCollision]] is the maxBits = 0
  * special case (kept separate — its equality loop is branch-cheaper
  * and pinned by existing specs/oracles).
  *
  * Same design as FirstCollision: one fused loop over ≤ bands ints,
  * no allocation, inside whole-stage codegen (`Integer.bitCount` is
  * an intrinsic). Compares the shorter prefix if lengths differ (the
  * join only ever feeds same-config signatures).
  */
case class FirstNearCollision(left: Expression, right: Expression,
    maxBits: Int) extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"first_near_collision requires (array<int>, array<int>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    FirstNearCollision.compute(l.asInstanceOf[ArrayData],
      r.asInstanceOf[ArrayData], maxBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val res = ctx.freshName("res")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $res = -1;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (java.lang.Integer.bitCount($a.getInt($i) ^ $b.getInt($i))
         |      <= $maxBits) { $res = $i; break; }
         |}
         |${ev.value} = $res;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FirstNearCollision =
    copy(left = newLeft, right = newRight)
}

object FirstNearCollision {

  def compute(a: ArrayData, b: ArrayData, maxBits: Int): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    while (i < n) {
      if (Integer.bitCount(a.getInt(i) ^ b.getInt(i)) <= maxBits) return i
      i += 1
    }
    -1
  }

  /** Column API: `first_near_collision($"sigs_a", $"sigs_b", 1)`. */
  def first_near_collision(a: Column, b: Column, maxBits: Int): Column =
    Bridge.column(FirstNearCollision(
      Bridge.expression(a), Bridge.expression(b), maxBits))
}
