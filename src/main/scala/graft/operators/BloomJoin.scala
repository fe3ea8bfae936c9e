package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Alias, BloomFilterMightContain, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** Bloom-filter semi-join pruning — the "runtime filter" shape, made
  * an explicit operator.
  *
  * At 100 TB the dominant cost of `fact JOIN dim` is shuffling fact
  * rows that will never find a partner. A Bloom filter built over the
  * dim side's join keys and applied at the fact SCAN kills those rows
  * before they reach the Exchange: no false negatives (every true
  * match survives), bounded false positives (removed by the exact
  * join that follows), so composing `bloomPrune → join` returns
  * bit-identical results to the plain join — which is exactly what
  * the DuckDB oracle checks.
  *
  * The filter is wired as a scalar subquery over the dim side
  * (`BloomFilterAggregate` → `BloomFilterMightContain`, the same
  * expressions Spark's own `spark.sql.optimizer.runtime.bloomFilter`
  * injection uses): the build executes distributed, its ~n·10-bit
  * result broadcasts to the probe side, and NOTHING is collected to
  * the driver. Keys are pre-hashed with `xxhash64` (LongType), the
  * form `BloomFilterAggregate` requires.
  *
  * Reference lineage: the reference prunes nothing — every reduce
  * task reads every map output (`worker.go:131-141`); this operator
  * is the scale-path refinement the MapReduce paradigm lacks.
  */
object BloomJoin {

  /** A predicate column: `might_contain(<bloom of dim keys>, hash(probeKey))`.
    *
    * `dimKeys` must be a single-column DataFrame of join keys. The
    * bloom is sized for `estItems` distinct keys (Spark defaults to
    * 3% false-positive rate at that size).
    */
  def bloomMightContain(dimKeys: DataFrame, probeKey: Column,
      estItems: Long): Column = {
    // Resolve the hash projection through the DataFrame API first, so
    // the hand-built Aggregate below references a bound attribute
    // (a raw Column expression would reach the analyzer unresolved
    // inside the subquery plan).
    val hashed = dimKeys.select(xxhash64(col(dimKeys.columns.head)).as("h"))
      .queryExecution.analyzed
    val buildPlan = Aggregate(
      Nil,
      Seq(Alias(new BloomFilterAggregate(hashed.output.head, estItems)
        .toAggregateExpression(), "graft_bloom")()),
      hashed)
    Bridge.column(BloomFilterMightContain(
      ScalarSubquery(buildPlan),
      Bridge.expression(xxhash64(probeKey))))
  }

  /** Prune `fact` rows whose `factKey` cannot match any `dimKeys` row
    * (may keep false positives; never drops a true match).
    */
  def bloomPrune(fact: DataFrame, factKey: String, dimKeys: DataFrame,
      estItems: Long): DataFrame =
    fact.filter(bloomMightContain(dimKeys, col(factKey), estItems))
}
