package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused 60-bit md5 hash — semantically identical to
  * `conv(substr(md5(x), 1, 15), 16, 10)` (= the DuckDB oracle's
  * `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`), but computed
  * directly from the digest bytes: the first 15 hex characters are the
  * first 60 bits, i.e. (first 8 bytes as big-endian u64) >>> 4.
  *
  * Cuts three allocations per call (32-char hex string, substring,
  * base-16 parse) on the hottest path in the engine — every MinHash
  * shingle, SimHash token and fingerprint token goes through this.
  * MessageDigest instances are thread-local (codegen calls the static
  * [[H60.hash]] from generated code).
  */
case class H60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"h60 requires a string argument, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    H60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.H60.hash($c);")

  override protected def withNewChildInternal(newChild: Expression): H60 =
    copy(child = newChild)
}

object H60 {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** 60-bit value of the md5 digest's first 15 hex digits. */
  def hash(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
    v >>> 4
  }
}
