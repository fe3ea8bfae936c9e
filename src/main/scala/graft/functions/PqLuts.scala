package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** ADC lookup-table construction — per subspace, the query
  * subvector's fixed-point dot with every codeword — as ONE native
  * fused loop per row, replacing the HOF formulation (per codeword:
  * `slice` + `zip_with` + `aggregate`, i.e. NumSub·NumCodes = 128
  * interpreted HOF folds per query row, whose 128-subtree projection
  * was the q_ann_pq_topk hot spot in the r16 audit).
  *
  * Exact arithmetic parity with the HOF/oracle formulation (pinned by
  * `PqCodesSpec`): per (subspace m, codeword c) the dot accumulates
  * LEFT-TO-RIGHT in doubles over `(double) emb[m·subDim+i] ·
  * (double) cw[i]` — the same IEEE sequence as
  * `aggregate(zip_with(slice(...), cw, ...), 0.0, +)` and DuckDB's
  * `list_reduce` — and the fixed-point step is
  * `floor(dot · 2³⁰ + 0.5)` exactly as Spark's `floor(double)` long
  * result. Output: `array<array<long>>`, `luts[m][c]` the table entry
  * (1-based via `element_at` at the call site).
  *
  * Null embedding → null; an embedding shorter than the codebooks'
  * total dimension → null (the corpora are fixed-dim; this guards the
  * kernel against out-of-bounds reads rather than encoding semantics).
  */
case class PqLuts(child: Expression,
    codebooks: Array[Array[Array[Float]]]) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_luts requires array<float>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    PqLuts.compute(input.asInstanceOf[ArrayData], codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("codebooks", codebooks, "float[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.PqLuts.compute($c, $cb);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqLuts =
    copy(child = newChild)

  // content equality (the PqCodes ruling): two PqLuts over equal
  // codebook VALUES must be semantically equal, or projection-level
  // subexpression elimination can't deduplicate them
  override def equals(o: Any): Boolean = o match {
    case p: PqLuts => p.child == child &&
      java.util.Arrays.deepEquals(
        p.codebooks.asInstanceOf[Array[AnyRef]],
        codebooks.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int = child.hashCode()
}

object PqLuts {

  /** Null when the embedding is shorter than the codebooks' total
    * dimension (never on the fixed-dim corpora).
    */
  def compute(emb: ArrayData, cb: Array[Array[Array[Float]]]): ArrayData = {
    val numSub = cb.length
    var total = 0
    var m = 0
    while (m < numSub) {
      total += (if (cb(m).isEmpty) 0 else cb(m)(0).length)
      m += 1
    }
    if (emb.numElements() < total) return null
    val luts = new Array[ArrayData](numSub)
    m = 0
    var off = 0
    while (m < numSub) {
      val words = cb(m)
      val subDim = if (words.isEmpty) 0 else words(0).length
      val lut = new Array[Long](words.length)
      var c = 0
      while (c < words.length) {
        val w = words(c)
        var dot = 0.0
        var i = 0
        while (i < subDim) {
          dot += emb.getFloat(off + i).toDouble * w(i).toDouble
          i += 1
        }
        lut(c) = math.floor(dot * 1073741824.0 + 0.5).toLong
        c += 1
      }
      luts(m) = new GenericArrayData(lut)
      off += subDim
      m += 1
    }
    new GenericArrayData(luts.asInstanceOf[Array[Any]])
  }

  /** Column API: `pqLuts($"embedding", cb)`. */
  def pqLuts(emb: Column, cb: Array[Array[Array[Float]]]): Column =
    Bridge.column(PqLuts(Bridge.expression(emb), cb))
}
