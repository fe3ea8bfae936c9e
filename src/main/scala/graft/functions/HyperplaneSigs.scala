package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** All `bands` × `r` hyperplane-LSH sign bits of an `array<float>`
  * embedding in ONE fused pass — band b's bucket is the r-bit integer
  * whose bit j is `dot(v, g_{b·r+j}) >= 0`, with the deterministic
  * coefficient family g(p,i) = (h60("hp<p>_<i>") % 2001 − 1000)/1000
  * shared with [[graft.llm.Similarity]]'s per-plane formulation and
  * its DuckDB mirror.
  *
  * Replaces bands·r separate `aggregate(zip_with(...))` higher-order
  * calls per row (each dispatching interpreted lambdas over the
  * vector) on the near-dup candidate path — the [[MinhashSigs]]
  * treatment. Each dot accumulates STRICTLY sequentially in index
  * order in double precision, bitwise-matching both the HOF
  * formulation it replaces and the oracle's ordered `list_reduce`
  * (equivalence asserted in HyperplaneSigsSpec).
  *
  * A vector whose length differs from `dim` yields NULL (surfacing
  * bad data, the [[CosineSim]] convention).
  */
case class HyperplaneSigs(child: Expression, bands: Int, r: Int, dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  // config validated at analysis time, mirroring [[HyperplaneProbes]]
  // (ADVICE r15: this expression had NO r check — `1 << j` wraps
  // silently past bit 31, corrupting buckets instead of failing)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) =>
      if (bands < 1) TypeCheckResult.TypeCheckFailure(
        s"hyperplane_sigs: bands must be >= 1, got $bands")
      // r <= 31 keeps the r-bit bucket a non-negative Int; the dials
      // respect this ceiling (nearDupRepPlanesFor clamps at 31)
      else if (r < 1 || r > 31) TypeCheckResult.TypeCheckFailure(
        s"hyperplane_sigs: r must be in [1, 31], got $r")
      else if (dim < 1) TypeCheckResult.TypeCheckFailure(
        s"hyperplane_sigs: dim must be >= 1, got $dim")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sigs requires array<float>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneSigs.compute(input.asInstanceOf[ArrayData], bands, r, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // freshName (not a hardcoded local): two instances fused into one
    // codegen scope would declare duplicate locals, fail Janino, and
    // silently fall back to interpreted eval (ADVICE r15, Sq8Gate)
    val res = ctx.freshName("res")
    nullSafeCodeGen(ctx, ev, c => s"""
      |Object $res = graft.functions.HyperplaneSigs.compute($c, $bands, $r, $dim);
      |if ($res == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $res; }
    """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigs =
    copy(child = newChild)
}

object HyperplaneSigs {

  private val tables =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Double]]()

  /** Flat (planes × dim) coefficient table, computed once per config
    * per JVM — identical values to Similarity.planeCol / the oracle's
    * bplanes CTE by construction (same h60 of the same plane names).
    */
  private[functions] def coeffs(planes: Int, dim: Int): Array[Double] =
    tables.computeIfAbsent((planes, dim), { case (p, d) =>
      val g = new Array[Double](p * d)
      var j = 0
      while (j < p) {
        var i = 0
        while (i < d) {
          val h = H60.hash(UTF8String.fromString(s"hp${j}_$i"))
          g(j * d + i) = (h % 2001 - 1000) / 1000.0
          i += 1
        }
        j += 1
      }
      g
    })

  /** One pass over the vector per plane, sequential double adds. */
  def compute(v: ArrayData, bands: Int, r: Int, dim: Int): ArrayData = {
    if (v.numElements() != dim) return null
    val g = coeffs(bands * r, dim)
    val out = new Array[Int](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0
      var j = 0
      while (j < r) {
        val base = (b * r + j) * dim
        var dot = 0.0
        var i = 0
        while (i < dim) {
          dot += v.getFloat(i).toDouble * g(base + i)
          i += 1
        }
        if (dot >= 0) bucket |= 1 << j
        j += 1
      }
      out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: `hyperplane_sigs($"embedding", bands, r, dim)`. */
  def hyperplane_sigs(emb: Column, bands: Int, r: Int, dim: Int): Column =
    Bridge.column(HyperplaneSigs(Bridge.expression(emb), bands, r, dim))
}
