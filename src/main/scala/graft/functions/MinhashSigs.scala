package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 16-member MinHash signature of a shingle array, as one native
  * codegen'd expression: per shingle the 31-bit base hash is
  * `H60.hash(s) & 0x7fffffff`, and member i's value is the minimum of
  * `(a_i·h + b_i) mod (2³¹−1)` over all shingles — identical to the
  * higher-order-function formulation it replaces (one `transform` per
  * family member over a bound hash array), but a single fused loop:
  * hash each shingle once, update 16 running minima, emit the array.
  * The HOF form dispatched interpreted lambdas O(16·shingles) times
  * per document on the hottest path of the dedup pipeline.
  *
  * Family constants live in [[graft.llm.PortableHash]] (31-bit random
  * multipliers — see the correlation post-mortem there; 31-bit a ×
  * 31-bit h ≤ 2⁶² keeps every intermediate in int64, which is what
  * keeps the DuckDB oracle portable).
  *
  * Null shingles inside the array are skipped; an all-null or EMPTY
  * array yields NULL — no minimum exists, and a sentinel signature
  * would make every empty document collide on every LSH band. (The
  * engine's own shingler always emits ≥1 shingle; this matters for
  * the registered `minhash_sigs` SQL function surface.)
  */
case class MinhashSigs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs requires array<string>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinhashSigs.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // freshName: duplicate hardcoded locals across fused instances
    // fail Janino and drop to interpreted eval (ADVICE r15, Sq8Gate)
    val res = ctx.freshName("res")
    nullSafeCodeGen(ctx, ev, c => s"""
      |Object $res = graft.functions.MinhashSigs.compute($c);
      |if ($res == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $res; }
    """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSigs =
    copy(child = newChild)
}

object MinhashSigs {
  private val Mod = 2147483647L
  private val A: Array[Long] = graft.llm.PortableHash.MinhashA.toArray
  private val B: Array[Long] = graft.llm.PortableHash.MinhashB.toArray

  /** One pass: hash each shingle, fold 16 running minima; null when
    * no non-null shingle exists (no minimum is defined).
    */
  def compute(shingles: ArrayData): ArrayData = {
    val mins = Array.fill(16)(Mod)
    val n = shingles.numElements()
    var any = false
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        any = true
        val h = H60.hash(shingles.getUTF8String(i)) & 0x7fffffffL
        var j = 0
        while (j < 16) {
          val v = (A(j) * h + B(j)) % Mod
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) null else new GenericArrayData(mins)
  }

  /** Column API: `minhash_sigs($"shingles")`. */
  def minhash_sigs(shingles: Column): Column =
    Bridge.column(MinhashSigs(Bridge.expression(shingles)))
}
