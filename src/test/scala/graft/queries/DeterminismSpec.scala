package graft.queries

import graft.SparkSpec

/** Partition-invariance: every registered query must produce the
  * identical result multiset when the shuffle partition count — and
  * therefore the partial-aggregation grouping, merge order, and task
  * boundaries — changes. This is THE scale portability property: a
  * query whose output depends on partitioning gives different answers
  * on a 32-core laptop and a 1000-executor cluster. It is also why
  * the engine sums doubles as fixed-point BIGINTs, totalizes window
  * orders, and tiebreaks every top-k — this sweep locks those
  * design rules in as a regression gate.
  *
  * Mechanics: run each query at the suite default (4 shuffle
  * partitions) and at a coprime 7, canonicalize rows as sorted JSON
  * (column names included, row order discarded), require exact
  * equality — doubles must match BIT-FOR-BIT, not approximately.
  */
class DeterminismSpec extends SparkSpec {

  private def canonical(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.toJSON.collect().toSeq.sorted

  test("every registered query is invariant to the shuffle partition count") {
    val conf = spark.conf
    val default = conf.get("spark.sql.shuffle.partitions")
    val failures = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .flatMap { case (name, fn) =>
        try {
          conf.set("spark.sql.shuffle.partitions", default)
          val a = canonical(fn(spark, sf001))
          conf.set("spark.sql.shuffle.partitions", "7")
          val b = canonical(fn(spark, sf001))
          if (a == b) None
          else {
            val diff = b.diff(a) ++ a.diff(b)
            Some(s"$name: ${diff.take(2).mkString(" | ").take(300)}")
          }
        } catch {
          case e: Throwable =>
            Some(s"$name: CRASH ${e.getClass.getSimpleName}: " +
              Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString)
        } finally conf.set("spark.sql.shuffle.partitions", default)
      }
    assert(failures.isEmpty,
      s"partition-dependent queries:\n${failures.mkString("\n")}")
  }
}
