package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Index of the FIRST position where two `array<int>` signature lists
  * agree (−1 if none) — the canonical-band dedup predicate of the
  * banded near-dup join (`first_collision(sigs_a, sigs_b) = band`
  * keeps a pair only in its earliest colliding band).
  *
  * Exists because the composable form —
  * `!exists(zip_with(slice(a,1,band), slice(b,1,band), _ === _), id)`
  * — allocates three intermediate arrays and dispatches interpreted
  * lambdas PER CANDIDATE ROW; at the ×1000 ScaleUp corpus (~10⁸
  * candidates) that filter dominated the whole query (1383 s). This
  * is one fused loop over ≤ bands ints, no allocation, inside
  * whole-stage codegen.
  *
  * Compares the shorter prefix if lengths differ (the join only ever
  * feeds same-config signatures, where lengths are equal).
  */
case class FirstCollision(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"first_collision requires (array<int>, array<int>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    FirstCollision.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val res = ctx.freshName("res")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $res = -1;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getInt($i) == $b.getInt($i)) { $res = $i; break; }
         |}
         |${ev.value} = $res;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FirstCollision =
    copy(left = newLeft, right = newRight)
}

object FirstCollision {

  def compute(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    while (i < n) {
      if (a.getInt(i) == b.getInt(i)) return i
      i += 1
    }
    -1
  }

  /** Column API: `first_collision($"sigs_a", $"sigs_b")`. */
  def first_collision(a: Column, b: Column): Column =
    Bridge.column(FirstCollision(Bridge.expression(a), Bridge.expression(b)))
}
