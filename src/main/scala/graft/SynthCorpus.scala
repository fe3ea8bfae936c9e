package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic collision-free synthetic embedding corpora for the
  * scale instruments ([[PlantedRecallProbe]], [[CandidateMassProbe]]):
  * N unique vectors whose components are seeded hash-derived uniforms
  * in [-1, 1], rendered once to /tmp/graft_synth_N and reused across
  * probe runs (the corpora extend measurement past what any ScaleUp
  * corpus can give — the ×1000 corpus holds only ~62k DISTINCT reps).
  */
object SynthCorpus {

  def dir(n: Long): String = s"/tmp/graft_synth_$n/embeddings.parquet"

  /** Render-if-missing, then read: (vec_id, embedding float[Dim]). */
  def embeddings(spark: SparkSession, n: Long): DataFrame = {
    val d = dir(n)
    val p = new org.apache.hadoop.fs.Path(d)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))) {
      spark.range(n).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(graft.llm.Similarity.Dim - 1)),
          i => ((pmod(xxhash64(concat_ws("_", lit("sv"), col("id"), i)),
            lit(2001)) - 1000) / 1000.0).cast("float")).as("embedding"))
        .write.mode("overwrite").parquet(d)
    }
    spark.read.parquet(d)
  }
}
