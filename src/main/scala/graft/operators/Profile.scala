package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass data-quality profiling: per-column null counts,
  * distinct counts, and numeric extents, computed as ONE aggregation
  * over ONE scan and then melted to a long (column, metric, value)
  * shape.
  *
  * The single-pass shape is the point at 100 TB: the naive profiler
  * loops `for c in columns: df.agg(...)` and scans the table
  * once per column. Here every metric is an aggregate expression in
  * the same `agg(...)`, so Catalyst fuses them into one
  * partial+final aggregate pass; `count_distinct` rewrites to
  * expand+distinct-aggregate internally but still rides the same
  * scan. Metrics are all cast to double so the melted value column
  * is uniformly typed (strings profile null/ndv only — their
  * min/max would force a lossy cross-type cast).
  */
object Profile {

  /** `(column, metric, value)` rows; metrics: `n_null`, `n_distinct`
    * for every column, plus `min`/`max` for numeric columns.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val numeric = cols.filter { c =>
      df.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
    }.toSet
    val aggs: Seq[Column] = cols.flatMap { c =>
      val base = Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).cast("double")
          .as(s"${c}__n_null"),
        countDistinct(col(c)).cast("double").as(s"${c}__n_distinct"))
      if (numeric(c))
        base ++ Seq(min(col(c)).cast("double").as(s"${c}__min"),
          max(col(c)).cast("double").as(s"${c}__max"))
      else base
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = wide.columns.map { m =>
      val Array(c, metric) = m.split("__", 2)
      s"'$c', '$metric', `$m`"
    }.mkString(", ")
    wide.selectExpr(
      s"stack(${wide.columns.length}, $stackArgs) AS (column_name, metric, value)")
  }
}
