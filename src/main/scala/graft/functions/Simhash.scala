package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit SimHash of a token array, as a native codegen'd expression.
  *
  * Per token w the bit source is `H60.hash(w || "#sim")` (the engine's
  * portable 60-bit md5 prefix, mirrored exactly by the DuckDB oracle's
  * `CAST('0x' || substr(md5(w || '#sim'),1,15) AS BIGINT)`); each of
  * the 60 hash bits votes +1/-1 weighted by token multiplicity, and bit
  * b of the result is set iff its vote sum is positive — identical
  * semantics to the higher-order-function formulation it replaces
  * (sum over b of CASE WHEN sum(votes) > 0 THEN 1<<b END), but one
  * fused loop per row: hash each token once, add its bit votes, fold
  * the 60 counters. (60, not 32: the width is the pigeonhole pair
  * scheme's capacity — see Dedup.simhashPairs — and 60 is every bit
  * the portable md5-prefix token hash carries.) The HOF form re-dispatched interpreted lambdas
  * O(width·tokens) times per document — this is the case SURVEY §2's
  * "native Expression beats UDF beats HOF" preference ordering exists
  * for.
  *
  * Null tokens inside the array are skipped (the upstream tokenizer
  * never produces them); a null array yields null.
  */
case class Simhash(child: Expression, suffix: String = "#sim")
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash requires array<string>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Simhash.compute(input.asInstanceOf[ArrayData], suffix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sfx = ctx.addReferenceObj("suffix", suffix, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Simhash.compute($c, $sfx);")
  }

  override protected def withNewChildInternal(newChild: Expression): Simhash =
    copy(child = newChild)
}

object Simhash {
  private val suffixes =
    new java.util.concurrent.ConcurrentHashMap[String, UTF8String]()

  /** One pass over the tokens: hash, accumulate per-bit votes, fold.
    * `suffix` salts the per-token bit source, giving INDEPENDENT
    * 60-bit fingerprints of the same tokens — the 120-bit pair
    * scheme concatenates two of them.
    */
  def compute(tokens: ArrayData, suffix: String): Long = {
    val sfx = suffixes.computeIfAbsent(suffix, UTF8String.fromString _)
    val counts = new Array[Int](60)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val w = tokens.getUTF8String(i)
        val h = H60.hash(UTF8String.concat(w, sfx))
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (counts(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  /** Column API: `simhash($"tokens")`. */
  def simhash(tokens: Column): Column =
    Bridge.column(Simhash(Bridge.expression(tokens)))

  /** Salted variant: an independent fingerprint family per suffix. */
  def simhash(tokens: Column, suffix: String): Column =
    Bridge.column(Simhash(Bridge.expression(tokens), suffix))
}
