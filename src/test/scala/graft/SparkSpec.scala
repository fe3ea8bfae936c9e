package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites — one JVM-wide SparkSession. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  def sf001 = "/root/testdata/sf0.001"
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      // local[4, 2]: 4 slots, maxFailures = 2 — task retry is LIVE
      // suite-wide (the reference's worker-crash re-execution,
      // coordinator.go:50,203-218), exercised directly by
      // CrashRecoverySpec; plain local[n] would fail the job on the
      // first task failure and could never test recovery.
      .master("local[4, 2]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Straggler mitigation on for the whole suite: the reference's
      // backup-task story (coordinator.go:203-218) maps to Spark
      // speculative execution; SpeculationSpec exercises it directly,
      // and every other suite doubles as proof that results are
      // speculation-safe (idempotent tasks, committed sinks).
      .config("spark.speculation", "true")
      .config("spark.speculation.interval", "100ms")
      .config("spark.speculation.multiplier", "1.5")
      .config("spark.speculation.quantile", "0.5")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
