package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression ratio of a string's UTF-8 bytes under DEFLATE level 6:
  * `compressed_size / raw_size`. A standard training-data quality
  * signal — highly repetitive text (boilerplate, keyword stuffing,
  * generated spam) compresses far below natural prose, so a low
  * ratio flags low-entropy documents cheaply and
  * language-independently. Empty input yields null.
  *
  * Deterministic for a given input (fixed level and strategy, no
  * dictionary), so re-runs and retries agree; NOT mirrored in SQL —
  * DEFLATE output is implementation-defined across libraries, which
  * is exactly the class of operator the rows-only oracle mode exists
  * for. Deflater instances are thread-local (reset per row), keeping
  * the expression thread-safe under codegen without per-row native
  * allocation.
  */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"deflate_ratio requires a string argument, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    DeflateRatio.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = "graft.functions.DeflateRatio"
    // freshName: duplicate hardcoded locals across fused instances
    // fail Janino and drop to interpreted eval (ADVICE r15, Sq8Gate)
    val res = ctx.freshName("res")
    nullSafeCodeGen(ctx, ev, c => s"""
       |Object $res = $f.compute($c);
       |if ($res == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = ((Double) $res).doubleValue(); }
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

object DeflateRatio {
  // one native zlib instance per thread, reset per row — same pattern
  // as H60's thread-local MessageDigest; allocating/ending a Deflater
  // per document would malloc/free native state on the hot path
  private val deflater = ThreadLocal.withInitial[java.util.zip.Deflater](() =>
    new java.util.zip.Deflater(6, /* nowrap = */ true))
  private val buf = ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](8192))

  def compute(s: UTF8String): java.lang.Double = {
    val raw = s.getBytes
    if (raw.length == 0) return null
    val d = deflater.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    val b = buf.get()
    var compressed = 0L
    while (!d.finished()) compressed += d.deflate(b)
    java.lang.Double.valueOf(compressed.toDouble / raw.length)
  }

  /** Column API: `deflate_ratio($"text")`. */
  def deflate_ratio(text: Column): Column =
    Bridge.column(DeflateRatio(Bridge.expression(text)))
}
