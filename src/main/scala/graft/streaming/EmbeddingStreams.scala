package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import graft.llm.Similarity

/** Incremental maintenance of the on-disk IVF index — how a 100 TB
  * embedding index actually gets BUILT: embeddings arrive as a stream
  * (new documents being embedded), each micro-batch runs the same
  * zero-shuffle literal-centroid assignment as batch
  * ([[Similarity.assignWith]] — one codegen'd cosine per centroid per
  * row), and the parquet sink appends the rows into the SAME
  * cell-partitioned layout [[Similarity.probeIvfIndex]] reads. The
  * sink's commit log makes the append exactly-once across restarts,
  * and probes running between micro-batches always see a consistent
  * prefix of the stream.
  *
  * Centroids are fixed at index-creation time (passed in, inlined as
  * literals) — the standard IVF contract: re-clustering means
  * re-indexing, arriving vectors never move existing ones.
  * StreamBatchParitySpec streams a corpus in two waves and asserts the
  * probe over the streamed index equals the batch in-memory IVF top-k
  * over the full corpus.
  */
object EmbeddingStreams {

  /** Start the index-maintenance stream: `embs` must be a streaming
    * (vec_id, embedding) frame; rows land in `path` partitioned by
    * cell, exactly-once via `checkpoint`.
    */
  def ivfIndexStream(embs: DataFrame, cents: Array[Array[Float]],
      path: String, checkpoint: String): StreamingQuery =
    Similarity.assignWith(embs, cents)
      .writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("cell")
      .outputMode("append")
      .start()

  /** Running per-label centroid maintenance over a streaming
    * (label, embedding) frame — the monitoring companion to the index
    * stream: as embeddings arrive, each label's mean vector updates
    * incrementally. The fixed-point BIGINT partials
    * ([[Similarity.centroidsOf]]) are associative, so streaming state
    * is 24 bytes per (label, dim) no matter how many vectors flow
    * through, micro-batch boundaries can't change the result, and the
    * drained aggregate is bit-identical to running the batch query
    * over the same rows (StreamBatchParitySpec).
    */
  def centroidStream(embs: DataFrame): DataFrame =
    Similarity.centroidsOf(embs)
}
