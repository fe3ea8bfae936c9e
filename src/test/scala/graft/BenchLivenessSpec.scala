package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the long-sweep heartbeat handshake (VERDICT r13 item 7 /
  * r14 item 5). Why this is a config-invariant spec and not an
  * injected-stall integration test — the documented ruling:
  * reproducing the production failure requires starving the driver's
  * RPC dispatcher for > spark.network.timeout while an executor
  * heartbeat is due, i.e. a multi-minute wall-clock freeze of shared
  * JVM threads; at test-suite scale that is either simulated so
  * heavily it no longer exercises HeartbeatReceiver's real expiry
  * path, or a 10+-minute flaky test gated on scheduler timing. The
  * behavior HAS one production-scale validation (the 2026-08-16
  * sweep kill at 600 s driver-side expiry, BASELINE.md) and the
  * failure was config-shaped, so the regression surface worth
  * pinning is the CONFIG INVARIANT both sides of the handshake must
  * keep — which is what broke: the executor side was widened in r13
  * while the driver side silently kept the 600 s default (= 10
  * misses, under the observed ~10-min stall).
  */
class BenchLivenessSpec extends AnyFunSuite {

  private def seconds(v: String): Long = {
    val t = v.trim.toLowerCase
    if (t.endsWith("ms")) t.dropRight(2).toLong / 1000
    else if (t.endsWith("s")) t.dropRight(1).toLong
    else if (t.endsWith("m")) t.dropRight(1).toLong * 60
    else t.toLong
  }

  test("driver-side expiry covers the stall budget the widening is for") {
    val interval = seconds(Bench.LivenessConfs("spark.executor.heartbeatInterval"))
    val maxFailures = Bench.LivenessConfs("spark.executor.heartbeat.maxFailures").toInt
    val networkTimeout = seconds(Bench.LivenessConfs("spark.network.timeout"))
    // the motivating incident was a ~10-minute scheduler stall: the
    // driver-side HeartbeatReceiver expiry must sit ABOVE it with
    // margin (at the 600 s default it sat exactly ON it and killed
    // the sweep), and far above a single heartbeat cycle
    assert(networkTimeout >= 3600,
      s"driver-side expiry $networkTimeout s no longer covers a 10-min stall")
    assert(networkTimeout >= 10 * interval,
      "driver expiry must tolerate many missed beats, not ~1")
    // the executor-side exit budget must not undercut the driver
    // side: if interval*maxFailures < networkTimeout the executor
    // kills itself before the driver would even notice — the r13
    // one-sided-widening bug in mirror image
    assert(interval * maxFailures >= networkTimeout,
      s"executor exit budget ${interval * maxFailures} s undercuts " +
        s"driver expiry $networkTimeout s")
  }

  test("tool JVMs gate the same values behind SPARK_GRAFT_LONG_SWEEP") {
    val sh = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("tools/runmain.sh")), "UTF-8")
    assert(sh.contains("SPARK_GRAFT_LONG_SWEEP"),
      "runmain.sh lost the long-sweep opt-in gate")
    Bench.LivenessConfs.foreach { case (k, v) =>
      assert(sh.contains(s"-D$k=$v"),
        s"runmain.sh long-sweep block drifted from Bench.LivenessConfs: $k=$v")
    }
  }
}
