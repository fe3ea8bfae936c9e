package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
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

  case class NearDupPair(vec_a: Long, vec_b: Long, cos: Double)
  // public: Dataset encoders codegen `new TimedProbeRow(...)` from
  // generated classes, which cannot touch private members
  case class TimedProbeRow(band_bucket: Long, vec_id: Long, exact: Boolean,
      embedding: Array[Float], ts: java.sql.Timestamp)
  case class TimedBucketState(
      members: List[(Long, Boolean, Array[Float], Long)])

  /** Streaming near-duplicate pairs with a sliding event-time TTL —
    * the incremental twin of [[Similarity.nearDupPairsMultiProbe]]
    * and the [[DocStreams.minhashDedupStreamTtl]] recall/storage
    * dial applied to pairs. Each arriving vector is REGISTERED under
    * its t+1 margin-probe buckets per band
    * ([[graft.functions.HyperplaneProbes]], position 0 = the exact
    * bucket) and PAIRED against the bucket's existing members within
    * `ttl`. A pair emits iff at least one side's registration in the
    * shared bucket is exact — precisely the batch candidate
    * condition `e(y) ∈ P(x) ∨ e(x) ∈ P(y)` (probe-probe contacts are
    * NOT batch candidates and are skipped) — scored inline with the
    * bitwise batch cosine ([[graft.functions.CosineSim.score]]) and
    * gated at ≥ 0.35, so a drained stream's pair set equals the
    * batch query's over gap-≤-ttl pairs (StreamBatchParitySpec).
    *
    * Pairing gates on the EVENT-TIME gap ≤ `ttl` — a deterministic
    * rule, independent of watermark lag and batch boundaries — and
    * bucket members garbage-collect once the watermark proves no
    * future non-late arrival can still pair with them
    * (`member_ts + ttl < watermark`: a surviving future row has
    * `ts ≥ watermark`, so its gap would exceed `ttl` anyway;
    * eviction is pure GC, never a semantics change).
    *
    * Emission is AT-LEAST-ONCE per pair (a pair meeting in several
    * bands emits per meeting — the [[graft.streaming.EventStreams]]
    * fact-emission discipline; consumers dedup by (vec_a, vec_b),
    * and the parity spec compares sets). Within a micro-batch,
    * arrivals process in vec_id order, so replayed batches emit
    * deterministically.
    *
    * STATE COST, stated honestly: each live vector is registered in
    * bands·(t+1) bucket groups and each registration carries the
    * full vector for inline scoring — ≈ bands·(t+1)·dim·4 bytes per
    * vector per ttl window (64·3·256 B ≈ 49 KB at the defaults), NOT
    * the slim id-only mass the batch side shuffles. That is the
    * price of single-operator scoring: the batch discipline (slim
    * candidates, then rescore joins) needs the pair stream joined
    * back to a vector store — two chained stateful stages, which
    * Structured Streaming does not compose in one append query — so
    * at 100-TB stream rates, run THIS operator for the candidate
    * signal on a short ttl, or compose candidates + foreachBatch
    * rescore against the accumulating vector table
    * ([[ivfIndexStream]]'s on-disk layout) at the consumer.
    */
  def nearDupPairsStreamTtl(embs: DataFrame, bands: Int, r: Int,
      t: Int, ttl: java.time.Duration,
      watermarkDelay: String = "10 minutes"): Dataset[NearDupPair] = {
    import embs.sparkSession.implicits._
    val ttlMs = ttl.toMillis
    val probed = embs
      .withWatermark("ts", watermarkDelay)
      .select(col("vec_id"), col("embedding"), col("ts"),
        posexplode(graft.functions.HyperplaneProbes.hyperplane_probes(
          col("embedding"), bands, r, Similarity.Dim, t))
          .as(Seq("pos", "bucket")))
      // pack (band, bucket) into one grouping key: band = pos/(t+1),
      // bucket is a non-negative r-bit int
      .select(
        ((col("pos") / (t + 1)).cast("long") * lit(4294967296L)
          + col("bucket")).as("band_bucket"),
        col("vec_id"),
        (pmod(col("pos"), lit(t + 1)) === 0).as("exact"),
        col("embedding"), col("ts"))
      .as[TimedProbeRow]
    probed
      .groupByKey(_.band_bucket)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (_: Long, rows: Iterator[TimedProbeRow],
            state: GroupState[TimedBucketState]) =>
          val wm = state.getCurrentWatermarkMs()
          var members = state.getOption.map(_.members).getOrElse(Nil)
            .filter(m => m._4 + ttlMs >= wm)
          val out = List.newBuilder[NearDupPair]
          rows.toSeq.sortBy(_.vec_id).foreach { row =>
            val rowMs = row.ts.getTime
            members.foreach { case (mid, mexact, memb, mts) =>
              if (mid != row.vec_id && (row.exact || mexact)
                  && math.abs(rowMs - mts) <= ttlMs) {
                val cos = graft.functions.CosineSim.score(row.embedding, memb)
                if (cos >= 0.35)
                  out += NearDupPair(math.min(mid, row.vec_id),
                    math.max(mid, row.vec_id), cos)
              }
            }
            members ::= ((row.vec_id, row.exact, row.embedding, rowMs))
          }
          if (members.isEmpty) state.remove()
          else {
            state.update(TimedBucketState(members))
            // wake at the earliest member expiry to GC (timeout must
            // sit past the current watermark)
            state.setTimeoutTimestamp(
              math.max(members.map(_._4 + ttlMs).min + 1, wm + 1))
          }
          out.result().iterator
      }
  }

  /** Unbounded variant over a (vec_id, embedding) stream: the TTL
    * machinery with a constant event time and an effectively
    * infinite ttl — every pair gap is 0, nothing ever evicts, and
    * the drained pair set equals the batch multiprobe query over the
    * WHOLE corpus (StreamBatchParitySpec). One implementation, two
    * bounds: the TTL variant above is the only stateful core.
    *
    * The constant instant sits far in the future with a delay larger
    * still, pinning the watermark at zero STRICTLY BELOW every row —
    * a constant AT the watermark would be dropped as late data.
    */
  def nearDupPairsStream(embs: DataFrame, bands: Int, r: Int,
      t: Int = Similarity.NearDupProbes): Dataset[NearDupPair] =
    nearDupPairsStreamTtl(
      embs.withColumn("ts", timestamp_seconds(lit(7258118400L))),
      bands, r, t, java.time.Duration.ofDays(3650000L), "3650000 days")
}
