package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL-invocable tokenizer UDTF — a native Catalyst `Generator`.
  *
  * This is the reference's `mapf` surface exposed to SQL (SURVEY.md
  * §2.3: "mapf ≈ UDTF, 1 input → N rows"): one text in, one row per
  * whitespace token out, blanks skipped (the reference's empty-line
  * tolerance, worker.go:144-146). Usable as
  * `SELECT ... LATERAL VIEW tokenize(text) t AS token` or
  * `SELECT tokenize(text) FROM docs` after [[graft.GraftExtensions]]
  * registration.
  *
  * Generators run interpreted in Spark (CodegenFallback is the norm —
  * explode() itself falls back); the per-row cost is one split, same
  * as the `explode(split(...))` composition the DataFrame layer uses.
  */
case class Tokenize(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(StructField("token", StringType, nullable = false) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"tokenize requires a string argument, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else v.asInstanceOf[UTF8String].toString
      .split("\\s+").iterator
      .filter(_.nonEmpty)
      .map(t => InternalRow(UTF8String.fromString(t)))
  }

  override protected def withNewChildInternal(newChild: Expression): Tokenize =
    copy(child = newChild)
}
