package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` forms of the reference's reduce
  * surface (`reducef func(string, []string) string`, worker.go:51) —
  * the UDAF-style alternative to `MRJob`'s `groupByKey.mapGroups`.
  *
  * Two shapes, matching SURVEY.md §2.3:
  *   - [[AssociativeAgg]]: when the reduce is commutative+associative
  *     (wordcount's `+`), the buffer is a single value and Spark plans
  *     partial+final aggregation — map-side combine, shuffle shrinks
  *     to |keys|·partitions. This is the 100 TB path.
  *   - [[HolisticAgg]]: the faithful general case — `reducef` sees the
  *     complete value list of a key in one call (worker.go:161-165).
  *     The buffer is the value list, so the shuffle carries all values
  *     (exactly what the reference does); use only when the reduce is
  *     genuinely non-decomposable.
  *
  * Register for SQL/DataFrame use via `functions.udaf(agg)`.
  */
object Aggregators {

  /** Commutative-associative reduce with a single-value buffer. */
  case class AssociativeAgg[V](zeroV: V, combine: (V, V) => V)(
      implicit vEnc: Encoder[V])
      extends Aggregator[V, V, V] {
    override def zero: V = zeroV
    override def reduce(b: V, a: V): V = combine(b, a)
    override def merge(b1: V, b2: V): V = combine(b1, b2)
    override def finish(b: V): V = b
    override def bufferEncoder: Encoder[V] = vEnc
    override def outputEncoder: Encoder[V] = vEnc
  }

  /** Holistic reduce: buffers every value of the key (like the
    * reference's grouped `values []string`), then applies `reducef`
    * once. Order of the buffered list is NOT guaranteed across
    * partitions — `reducef` must be order-insensitive or sort first
    * (the reference sorts by key only, values arrive in file order;
    * we make no stronger promise).
    */
  case class HolisticAgg[V, OUT](reducef: Seq[V] => OUT)(
      implicit listEnc: Encoder[List[V]], outEnc: Encoder[OUT])
      extends Aggregator[V, List[V], OUT] {
    override def zero: List[V] = Nil
    override def reduce(b: List[V], a: V): List[V] = a :: b
    override def merge(b1: List[V], b2: List[V]): List[V] = b1 ::: b2
    override def finish(b: List[V]): OUT = reducef(b)
    override def bufferEncoder: Encoder[List[V]] = listEnc
    override def outputEncoder: Encoder[OUT] = outEnc
  }

  /** Ready-made instances for the canonical jobs. */
  def sumLong: Aggregator[Long, Long, Long] =
    AssociativeAgg[Long](0L, _ + _)(Encoders.scalaLong)

  /** Median as a genuinely holistic reduce (not decomposable). */
  def medianDouble(implicit listEnc: Encoder[List[Double]],
      outEnc: Encoder[Double]): Aggregator[Double, List[Double], Double] =
    HolisticAgg[Double, Double] { vs =>
      val s = vs.sorted
      val n = s.size
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
}
