package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's programmable surface, typed and Spark-compiled.
  *
  * The reference runs a user `mapf(filename, contents) -> []KeyValue`
  * and `reducef(key, values) -> string` (worker.go:51) through
  * map → FNV-hash shuffle (worker.go:105-110) → per-partition sort →
  * run-length group → reduce (worker.go:153-169). `MRJob` keeps that
  * contract but compiles it to Dataset transformations, so the
  * scheduling/shuffle/fault-tolerance machinery (coordinator.go — task
  * queues, 10 s straggler deadline, atomic rename commit) is replaced
  * wholesale by Spark's DAGScheduler, shuffle service, speculation and
  * FileOutputCommitter.
  *
  * Semantics preserved (SURVEY.md §2.1 notes):
  *   - reduce is HOLISTIC: `reducef` sees every value of a key in one
  *     call (worker.go:161-165) → `groupByKey(...).mapGroups(...)`,
  *     never `reduceByKey`, in the general path;
  *   - grouping is exact binary string/key equality (worker.go:21) —
  *     default binary collation, no locale;
  *   - output is `nReduce` files, keys sorted within each file, NOT
  *     globally (README.MD:43-53, worker.go:153).
  *
  * Scale notes: the holistic path materializes one key's values at a
  * time (like the reference, worker.go:161-163) but streams via the
  * grouped iterator — no whole-partition buffering. When the reduce is
  * associative, use [[runAssociative]]: partial aggregation turns the
  * shuffle from |pairs| into |keys|·partitions — the difference
  * between a working and a melted 100 TB wordcount.
  */
final case class MRJob[K, V, OUT](
    mapf: (String, String) => IterableOnce[(K, V)],
    reducef: (K, Iterator[V]) => OUT,
    nReduce: Int = 8) {

  /** Full pipeline over text files: one (path, contents) pair per file,
    * exactly the reference's map-input contract (worker.go:94-104;
    * one MAP task per file, coordinator.go:185-198).
    */
  def run(spark: SparkSession, inputGlob: String)(implicit
      kEnc: Encoder[K],
      kvEnc: Encoder[(K, V)],
      outEnc: Encoder[(K, OUT)]): Dataset[(K, OUT)] = {
    val files = spark.sparkContext.wholeTextFiles(inputGlob)
    val mapped = files.flatMap { case (name, contents) => mapf(name, contents) }
    runOnPairs(spark.createDataset(mapped))
  }

  /** Shuffle + group + holistic reduce over an already-mapped KV set. */
  def runOnPairs(kvs: Dataset[(K, V)])(implicit
      kEnc: Encoder[K],
      outEnc: Encoder[(K, OUT)]): Dataset[(K, OUT)] =
    kvs.groupByKey(_._1)
      .mapGroups((k, it) => (k, reducef(k, it.map(_._2))))

  /** Associative fast path — the combiner the reference lacks
    * (map side writes raw pairs, worker.go:107-118). `reduceGroups`
    * plans partial + final ObjectHashAggregate: map-side combine
    * shrinks the shuffle to |distinct keys| per partition.
    */
  def runAssociative(kvs: Dataset[(K, V)], combine: (V, V) => V)(implicit
      kEnc: Encoder[K],
      kvEnc: Encoder[(K, V)]): Dataset[(K, V)] =
    kvs.groupByKey(_._1)
      .reduceGroups((a: (K, V), b: (K, V)) => (a._1, combine(a._2, b._2)))
      .map { case (k, (_, v)) => (k, v) }

  /** Output fidelity sink: `nReduce` text files, `"key value"` lines,
    * sorted by key within each file (README.MD:43-53; format
    * worker.go:167). Placement uses Spark's Murmur3 hash, not the
    * reference's FNV-1a — compare outputs as multisets, not
    * file-by-file (use `graft.functions.Fnv1a` when placement
    * fidelity itself is under test).
    */
  def writeTextOutput(out: Dataset[(K, OUT)], dir: String): Unit =
    out.toDF("key", "value")
      .repartition(nReduce, col("key"))
      .sortWithinPartitions("key")
      .select(concat_ws(" ", col("key").cast("string"), col("value").cast("string")))
      .write.mode("overwrite").text(dir)
}
