package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pins that a bench failure's evidence lands IN the artifact
  * (VERDICT r15 item 1 / next-round item 2): the r15 driver run
  * reported `failed:["q_dedup_cluster_stats"]` with the exception
  * printed to stderr only — the driver's log tail didn't retain it
  * and the flake became undiagnosable after the fact. These tests
  * force a failing query through the extracted bench loop and assert
  * the class/message/frame/rep diagnostic reaches the JSON, the
  * `failed` name-list shape the driver parses is unchanged, and
  * arbitrary exception text cannot break the one-line JSON contract.
  */
class BenchFailureSpec extends SparkSpec {

  private def noopForce(df: DataFrame): Unit = { df.queryExecution.executedPlan; () }

  private val okQuery: (SparkSession, String) => DataFrame =
    (s, _) => s.range(3).toDF("id")

  test("a failing query carries class, message, top frame, and rep in the artifact") {
    val boom: (SparkSession, String) => DataFrame =
      (_, _) => throw new IllegalStateException("boom: disk full")
    val results = Bench.runQueries(spark, "unused",
      Seq("q_ok" -> okQuery, "q_bad" -> boom), reps = 2, force = noopForce)

    val bad = results.find(_.name == "q_bad").get
    assert(!bad.ok)
    val err = bad.error.getOrElse(fail("failed query recorded no error"))
    assert(err.startsWith("IllegalStateException: boom: disk full @ "))
    assert(err.contains("BenchFailureSpec"), s"top frame missing from: $err")
    assert(err.endsWith("(rep 1)"), s"failing rep missing from: $err")
    assert(results.find(_.name == "q_ok").exists(r => r.ok && r.error.isEmpty))

    val fields = Bench.failedFields(results)
    assert(fields.contains("\"failed\":[\"q_bad\"]"),
      s"driver-parsed name-list shape drifted: $fields")
    assert(fields.contains(
      "\"failed_errors\":{\"q_bad\":\"IllegalStateException: boom"),
      s"diagnostic missing from artifact fields: $fields")
  }

  test("a query failing only in a later rep is failed, with that rep recorded") {
    var calls = 0
    val flaky: (SparkSession, String) => DataFrame = (s, _) => {
      calls += 1
      if (calls >= 2) throw new RuntimeException("second rep dies")
      s.range(1).toDF("id")
    }
    val results = Bench.runQueries(spark, "unused",
      Seq("q_flaky" -> flaky), reps = 3, force = noopForce)
    val r = results.head
    assert(!r.ok, "a query that failed in ANY rep must be reported failed")
    assert(r.error.exists(_.endsWith("(rep 2)")), s"wrong rep in: ${r.error}")
  }

  test("exception text with quotes, newlines, and control chars stays one-line JSON") {
    val nasty: (SparkSession, String) => DataFrame =
      (_, _) => throw new RuntimeException("a \"quoted\" path\nline2\tcolx")
    val results = Bench.runQueries(spark, "unused",
      Seq("q_nasty" -> nasty), reps = 1, force = noopForce)
    val fields = Bench.failedFields(results)
    assert(!fields.contains('\n') && !fields.contains('\t'),
      "raw control characters leaked into the artifact line")
    // the diagnostic keeps the message's FIRST line only (bounded —
    // Spark messages can embed whole plans), with quotes escaped
    assert(fields.contains("a \\\"quoted\\\" path"), s"escaping drifted: $fields")
    assert(!fields.contains("line2"), "first-line truncation drifted")
    assert(fields.contains("@ graft.BenchFailureSpec"))
    // the escaper itself must handle every control character a
    // multi-line message could carry, had it reached it
    assert(Bench.jsonEscape("a\"b\\c\nd\re\tf\u0001g") ==
      "a\\\"b\\\\c\\nd\\re\\tf\\u0001g")
  }

  test("a null exception message does not NPE the diagnostic") {
    val d = Bench.describeFailure(new RuntimeException(null: String), 3)
    assert(d.startsWith("RuntimeException: "), s"unexpected shape: $d")
    assert(d.contains(" @ "), s"unexpected shape: $d")
    assert(d.endsWith("(rep 3)"))
  }
}
