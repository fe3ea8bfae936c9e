package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Measures the streaming near-dup twins' STATE FOOTPRINT — the
  * evidence behind the r11 state-design claims (VERDICT r10 items
  * 2–3): on the same corpus ∪ planted 100-copy duplicate cohort,
  * drive (a) the scored collapsed-state operator
  * ([[graft.streaming.EmbeddingStreams.nearDupPairsStream]]) and
  * (b) the slim candidate operator
  * ([[graft.streaming.EmbeddingStreams.nearDupCandidatesStream]]),
  * and print each query's state-store rows + bytes from its own
  * progress metrics. Expected shape: (a)'s bytes grow with DISTINCT
  * vectors only (the 100-copy cohort adds ~16 B/copy, not
  * 49 KB/copy), (b)'s bytes are ids-only (no arrays at all), tens of
  * bytes per registration.
  *
  * Usage: StreamStateProbe [sfDir=/root/testdata/sf0.001]
  */
object StreamStateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ebatch = Tables.embeddings(spark, sfDir)
    val vecs = ebatch.select(col("vec_id"), col("embedding")).collect()
      .map(x => (x.getLong(0), x.getSeq[Float](1).toArray)).toSeq
    val shift = vecs.map(_._1).max + 1
    val cohort = (0 until 100).map(k => (shift + k, vecs.head._2))
    val corpus = vecs ++ cohort
    val (bands, r, t) = (graft.llm.Similarity.NearDupBands,
      graft.llm.Similarity.nearDupMultiProbePlanesFor(corpus.size.toLong),
      graft.llm.Similarity.NearDupProbes)
    println(s"[state] n=${corpus.size} (distinct ${vecs.size + 1} among cohort) " +
      s"dials=($bands, $r, $t) probe rows/vec=${bands * (t + 1)}")

    def drive(name: String)(mk: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.Dataset[_]): Unit = {
      val in = MemoryStream[(Long, Array[Float])]
      val q = mk(in.toDS().toDF("vec_id", "embedding"))
        .writeStream.format("noop").outputMode("append").start()
      corpus.grouped((corpus.size + 1) / 2).foreach { w =>
        in.addData(w); q.processAllAvailable()
      }
      val st = q.lastProgress.stateOperators
      st.foreach { s =>
        println(f"[state] $name%-10s rows=${s.numRowsTotal}%9d " +
          f"bytes=${s.memoryUsedBytes}%12d " +
          f"(${s.memoryUsedBytes.toDouble / corpus.size}%9.1f B/vec)")
      }
      q.stop()
    }

    drive("scored") { df =>
      graft.streaming.EmbeddingStreams.nearDupPairsStream(df, bands, r, t) }
    drive("slim") { df =>
      graft.streaming.EmbeddingStreams.nearDupCandidatesStream(df, bands, r, t) }
    spark.stop()
  }
}
