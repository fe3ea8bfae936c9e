package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Overlapping fixed-size chunks of a token array as one native
  * expression: `chunks(ws, size, stride)` emits
  * `ceil(max(len-size,0)/stride) + 1` space-joined windows starting at
  * 0, stride, 2·stride, … — identical to the HOF formulation
  * (`transform(sequence(0, greatest(ceil((size(ws)-size)/stride),0)),
  * i -> concat_ws(' ', slice(ws, i*stride+1, size)))`) used by the
  * 32/24 pre-tokenization packing step, but one fused loop per row.
  * An empty token array yields a single empty chunk (sequence 0..0),
  * matching the HOF. Null tokens are skipped per concat_ws.
  */
case class Chunks(child: Expression, size: Int, stride: Int)
    extends UnaryExpression {
  require(size >= 1 && stride >= 1, s"size/stride must be >= 1, got $size/$stride")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"chunks requires array<string>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Chunks.compute(input.asInstanceOf[ArrayData], size, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Chunks.compute($c, $size, $stride);")

  override protected def withNewChildInternal(newChild: Expression): Chunks =
    copy(child = newChild)
}

object Chunks {
  private val Space = UTF8String.fromString(" ")

  def compute(tokens: ArrayData, size: Int, stride: Int): ArrayData = {
    val len = tokens.numElements()
    val nChunks = (math.max(len - size, 0) + stride - 1) / stride + 1
    val out = new Array[Any](nChunks)
    var c = 0
    while (c < nChunks) {
      val start = c * stride
      val end = math.min(start + size, len)
      val parts = new java.util.ArrayList[UTF8String](size)
      var j = start
      while (j < end) {
        if (!tokens.isNullAt(j)) parts.add(tokens.getUTF8String(j))
        j += 1
      }
      out(c) = UTF8String.concatWs(Space, parts.toArray(new Array[UTF8String](0)): _*)
      c += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: `chunks($"tokens", 32, 24)`. */
  def chunks(tokens: Column, size: Int, stride: Int): Column =
    Bridge.column(Chunks(Bridge.expression(tokens), size, stride))
}
