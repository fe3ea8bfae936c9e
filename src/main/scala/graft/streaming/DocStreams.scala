package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming corpus deduplication — the incremental twin of the batch
  * dedup collapse in [[graft.llm.Dedup]]: documents arrive as a
  * stream, each computes its MinHash signature map-side (the same
  * native expression as batch), and `flatMapGroupsWithState` keyed on
  * the FULL 16-value signature keeps first-wins state — a document is
  * emitted iff its signature has never been seen, across micro-batch
  * boundaries and restarts (state lives in the checkpoint).
  *
  * Why the full signature and not one band: a document owns 8 band
  * keys, and near-dup keep/drop needs consensus ACROSS its bands —
  * a second stateful shuffle that streaming restricts. At
  * full-signature granularity (the est_jaccard = 1.0 bucket) one
  * stateful operator is exact, and it subsumes exact token-stream
  * dedup: identical token streams have identical signatures. Band-
  * level near-dup streaming would layer this same state shape per
  * band plus a doc-level vote; the batch path remains the reference
  * semantics for that.
  *
  * Scale: state is one (signature → doc_id) entry per DISTINCT
  * content ever seen — the same O(distinct) bound as the batch
  * collapse. NoTimeout keeps suppression forever; a production
  * deployment bounds storage with a ProcessingTimeTimeout TTL,
  * trading recall of very-late duplicates (the watermark tradeoff
  * [[EventStreams.dedupStream]] documents for events).
  */
object DocStreams {

  case class KeptDoc(doc_id: Long, sig: String)

  /** First-wins incremental signature dedup over a streaming
    * (doc_id, text) frame. Within one micro-batch the min doc_id of
    * a signature group wins, so ordered arrival (ids ascending, the
    * append-only ingest case) reproduces the batch min-doc_id
    * collapse exactly — asserted in StreamBatchParitySpec.
    */
  def minhashDedupStream(docs: DataFrame): Dataset[KeptDoc] = {
    import docs.sparkSession.implicits._
    docs
      .select(col("doc_id"), graft.llm.Dedup.signatureKey.as("sig"))
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (sig: String, rows: Iterator[(Long, String)], state: GroupState[Long]) =>
          if (state.exists) Iterator.empty
          else {
            val keep = rows.map(_._1).min
            state.update(keep)
            Iterator.single(KeptDoc(keep, sig))
          }
      }
  }
}
