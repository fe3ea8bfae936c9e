package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** PQ encoding — nearest codeword per subspace — as ONE native fused
  * loop per row, replacing the HOF formulation (per codeword:
  * `slice` + `zip_with` + `aggregate`, each allocating an array and
  * dispatching interpreted lambdas; ~128 HOF evaluations per row
  * made `q_ann_pq_topk` the slowest ANN query at the ×1000 probe).
  *
  * Exact arithmetic parity with the HOF/oracle formulation (pinned
  * by `PqCodesSpec`): per subspace the squared-L2 fold runs
  * LEFT-TO-RIGHT in doubles (`(x−g)²` accumulated sequentially —
  * the same IEEE sequence as `aggregate(zip_with(...))` and DuckDB's
  * `list_reduce`), and the argmin keeps the FIRST minimum
  * (strict `<` replacement = `array_position(a, array_min(a))`).
  *
  * `codebooks(m)(c)` is codeword c of subspace m; dims derive from
  * the codebook shape. Null embedding → null.
  */
case class PqCodes(child: Expression,
    codebooks: Array[Array[Array[Float]]]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_codes requires array<float>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    PqCodes.compute(input.asInstanceOf[ArrayData], codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("codebooks", codebooks, "float[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqCodes.compute($c, $cb);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)

  // the codebook array must not leak into semanticEquals-by-reference
  // surprises: two PqCodes with equal codebook CONTENT are equal
  override def equals(o: Any): Boolean = o match {
    case p: PqCodes => p.child == child &&
      java.util.Arrays.deepEquals(
        p.codebooks.asInstanceOf[Array[AnyRef]],
        codebooks.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int = child.hashCode()
}

object PqCodes {

  def compute(emb: ArrayData, cb: Array[Array[Array[Float]]]): ArrayData = {
    val numSub = cb.length
    val codes = new Array[Int](numSub)
    var m = 0
    var off = 0
    while (m < numSub) {
      val words = cb(m)
      val subDim = if (words.isEmpty) 0 else words(0).length
      var best = Double.MaxValue
      var bestC = 0
      var c = 0
      while (c < words.length) {
        val w = words(c)
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val x = emb.getFloat(off + i).toDouble - w(i).toDouble
          d += x * x
          i += 1
        }
        if (d < best) { best = d; bestC = c }
        c += 1
      }
      codes(m) = bestC
      off += subDim
      m += 1
    }
    new GenericArrayData(codes)
  }

  /** Column API: `pqCodes($"embedding", cb)`. */
  def pqCodes(emb: Column, cb: Array[Array[Array[Float]]]): Column =
    Bridge.column(PqCodes(Bridge.expression(emb), cb))
}
