package graft

import graft.llm.Dedup

/** The checkpoint-policy dial ([[Materialize]]): identical results in
  * every mode, on the query that exercises staging hardest
  * (dedupClusters: staged signature table + staged edge set + the CC
  * loop). Modes are isolated per newSession() so the shared suite
  * session keeps its default.
  */
class MaterializeSpec extends SparkSpec {

  private def clustersWith(mode: String): Set[(Long, Long, Boolean)] = {
    val s = spark.newSession()
    s.conf.set(Materialize.ModeKey, mode)
    Dedup.dedupClusters(s, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
  }

  private lazy val baseline = clustersWith("local")

  test("disk mode (persist DISK_ONLY, lineage retained) matches local") {
    assert(clustersWith("disk") == baseline)
  }

  test("reliable mode (replicated checkpoint dir) matches local") {
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graftckpt").toString)
    assert(clustersWith("reliable") == baseline)
  }

  test("an unknown mode fails loudly at plan construction") {
    intercept[IllegalArgumentException](clustersWith("bogus"))
  }
}
