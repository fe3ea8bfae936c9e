package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 32-bit hash of a string, masked to non-negative — the
  * reference's shuffle-partitioning hash (`ihash`, worker.go:35-41:
  * `fnv.New32a(); h.Write(key); h.Sum32() & 0x7fffffff`).
  *
  * Spark's own shuffle uses Murmur3; query RESULTS never depend on
  * bucket placement, so this expression exists only for placement
  * fidelity (e.g. reproducing the reference's `mr-X-Y` file layout via
  * `pmod(fnv1a(key), nReduce)`) and as the house example of a native
  * codegen'd Catalyst Expression (stays inside WholeStageCodegen; a
  * Scala UDF here would break the codegen span).
  */
case class Fnv1a(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fnv1a requires a string argument, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0x811c9dc5
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xff)
      h *= 0x01000193
      i += 1
    }
    h & 0x7fffffff
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |int $h = 0x811c9dc5;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h ^= ($bytes[$i] & 0xff);
         |  $h *= 0x01000193;
         |}
         |${ev.value} = $h & 0x7fffffff;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Fnv1a =
    copy(child = newChild)
}

object Fnv1a {
  /** Column API: `fnv1a($"key")`. */
  def fnv1a(c: Column): Column = Bridge.column(Fnv1a(Bridge.expression(c)))
}
