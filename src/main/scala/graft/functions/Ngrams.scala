package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Space-joined word n-grams of a token array as one native
  * expression: `ngrams(["a","b","c","d"], 3) = ["a b c", "b c d"]`.
  * Fewer than `n` tokens yields an empty array.
  *
  * Replaces the `transform(sequence(1, size-n+1), i ->
  * concat_ws(' ', slice(ws, i, n)))` higher-order-function idiom used
  * by MinHash shingling, the repetition filter, and decontamination —
  * one fused loop per row instead of a lambda dispatch per gram, and
  * each join allocates exactly one UTF8String. Semantics match
  * `concat_ws`, which skips null tokens (the shared tokenizer never
  * produces them).
  */
case class Ngrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"ngram size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngrams requires array<string>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Ngrams.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Ngrams.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Ngrams =
    copy(child = newChild)
}

object Ngrams {
  private val Space = UTF8String.fromString(" ")

  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i <= len - n) {
      // concat_ws semantics: null tokens are skipped, not rendered
      val parts = new java.util.ArrayList[UTF8String](n)
      var j = 0
      while (j < n) {
        if (!tokens.isNullAt(i + j)) parts.add(tokens.getUTF8String(i + j))
        j += 1
      }
      out(i) = UTF8String.concatWs(Space, parts.toArray(new Array[UTF8String](0)): _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: `ngrams($"tokens", 3)`. */
  def ngrams(tokens: Column, n: Int): Column =
    Bridge.column(Ngrams(Bridge.expression(tokens), n))
}
