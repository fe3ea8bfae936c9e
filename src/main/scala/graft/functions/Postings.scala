package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The per-document positional posting list, built IN-ROW: one scan
  * of the text yields every (word, n_occ, "p1,p2,…") group of the
  * positional inverted index.
  *
  * Why an expression and not a groupBy: the index groups on
  * (word, doc_id) — a key that only ever co-occurs inside ONE
  * document row, so the aggregation has no cross-partition groups at
  * all and the exchange moves the entire posting mass (~1B rows at
  * the ×1000 corpus) for nothing. In-row construction is the same
  * wordcount-shaped result with ZERO shuffle: the only stage is a
  * parquet scan + explode, and at 100 TB the index build is pure
  * map work whose output can be sunk partition-local or bucketed by
  * word in the SAME single pass (the sink's shuffle then exists only
  * if the LAYOUT wants it, not because the semantics demanded one).
  *
  * Exact semantics of the original construction (pinned both ways by
  * `PostingsSpec`, corpus + adversarial whitespace cases, and by the
  * unchanged DuckDB oracle):
  *  - tokens = split(text, "\\s+") — Java regex, so `\s` is exactly
  *    [ \t\n\x0B\f\r]; a leading whitespace run yields a leading ""
  *    element (limit −1 also keeps a trailing "" — carrying no word
  *    either way);
  *  - pos = 1-based index over that UNFILTERED split, so every token's
  *    position is its token ordinal + 1 iff the text starts with
  *    whitespace (interior empties cannot occur: \s+ is maximal);
  *  - empty tokens are dropped AFTER position assignment;
  *  - n_occ = occurrences of the word in the doc; positions = the
  *    ascending (= scan-order) offsets joined with ",".
  */
case class Postings(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(Postings.entryType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"postings requires string, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Postings.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" graft.functions.Postings.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Postings =
    copy(child = newChild)
}

object Postings {

  val entryType: StructType = StructType(Seq(
    StructField("word", StringType, nullable = false),
    StructField("n_occ", LongType, nullable = false),
    StructField("positions", StringType, nullable = false)))

  // Java \s without UNICODE_CHARACTER_CLASS — all BMP single chars,
  // so a char-level scan sees exactly the regex's split points
  private def isWs(c: Char): Boolean = c == ' ' || c == '\t' ||
    c == '\n' || c == 0x0B || c == '\f' || c == '\r'

  private final class Group(var n: Long, val pos: java.lang.StringBuilder)

  def compute(text: UTF8String): ArrayData = {
    val s = text.toString
    val n = s.length
    // leading whitespace ⇒ split() emits a leading "" that occupies
    // position 1, shifting every real token's position by one
    var pos = if (n > 0 && isWs(s.charAt(0))) 1 else 0
    val groups = new java.util.LinkedHashMap[String, Group]()
    var i = 0
    while (i < n) {
      if (isWs(s.charAt(i))) { i += 1 }
      else {
        val start = i
        while (i < n && !isWs(s.charAt(i))) i += 1
        pos += 1
        val w = s.substring(start, i)
        val g = groups.get(w)
        if (g == null) {
          val nb = new java.lang.StringBuilder()
          nb.append(pos)
          groups.put(w, new Group(1L, nb))
        } else {
          g.n += 1L
          g.pos.append(',').append(pos)
        }
      }
    }
    val out = new Array[Any](groups.size)
    val it = groups.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(e.getKey), e.getValue.n,
        UTF8String.fromString(e.getValue.pos.toString))): InternalRow
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: `postings($"text")` → array of (word, n_occ, positions). */
  def postings(text: Column): Column =
    Bridge.column(Postings(Bridge.expression(text)))
}
