package graft.queries

import graft.SparkSpec
import java.nio.file.Files

/** Robustness: every registered query must run (and return an empty
  * or degenerate-but-valid result) on a corpus where every table has
  * zero rows. At 100 TB, empty partitions, empty date ranges, and
  * empty filter results are everyday inputs — an operator that
  * divides by a count, collects a first row, or mins an empty array
  * without guarding will die here first.
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = Files.createTempDirectory("empty-sf").toString
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      // route through the Tables loader so events' nanos->micros
      // conversion is baked into the written (timestamp-typed) schema
      val df = if (t == "events") graft.Tables.events(spark, sf001)
        else graft.Tables.table(spark, sf001, t)
      df.limit(0).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every registered query survives a zero-row corpus") {
    val failures = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .flatMap { case (name, fn) =>
        try { fn(spark, emptyDir).collect(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString)
        }
      }
    assert(failures.isEmpty,
      s"queries crashed on empty input:\n${failures.mkString("\n")}")
  }
}
