package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.fingerprint

/** Streaming exact deduplication — the crawl-ingest shape run ON the
  * stream instead of in batches: content fingerprints are the state key,
  * so every arriving document is deduped against everything ever seen
  * without re-reading history.
  *
  * Both forms are the SAME logical plan as their batch analogs
  * ([[graft.ops.Dedup.exactGroups]] family), which is what makes the
  * stream==batch contract checkable (StreamingSpec) and the s06 query
  * oracle-able in its batch form: Structured Streaming just executes the
  * plan incrementally.
  *
  * State at scale: the streaming state store holds one entry per
  * distinct (group, fingerprint) — the same index
  * [[graft.ops.Dedup.incrementalFresh]] keeps in a KV Store for the
  * batch pipeline. Production bounds it the usual ways (watermark/TTL
  * when dedup has a recency horizon, or the KV-store batch path when it
  * must be unbounded and durable); the operators themselves add no
  * other state.
  */
object DedupStream {

  /** Per-(group, content) duplication state: keeper (min id) and copy
    * count. Valid on a batch OR streaming frame — on a stream, run in
    * update/complete mode; min and count are order-insensitive, so the
    * final state equals the batch result under ANY arrival order.
    */
  def groups(docs: DataFrame, textCol: String, idCol: String,
      groupCol: String): DataFrame =
    docs
      .select(col(groupCol), fingerprint(col(textCol)).as("fp"), col(idCol))
      .groupBy(col(groupCol), col("fp"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Per-group dedup monitoring stats — the readout an ingest pipeline
    * watches: docs seen, distinct contents, duplicates. Batch form of
    * the s06 query; the streaming pipeline derives the same numbers from
    * [[groups]] state (StreamingSpec proves the derivation matches).
    */
  def stats(docs: DataFrame, textCol: String, idCol: String,
      groupCol: String): DataFrame =
    groups(docs, textCol, idCol, groupCol)
      .groupBy(col(groupCol))
      .agg(
        sum(col("n_copies")).as("n_docs"),
        count(lit(1)).as("n_distinct"),
        (sum(col("n_copies")) - count(lit(1))).as("n_dups"))

  /** First-arrival survivors on a stream: `dropDuplicates` on the
    * content fingerprint — each distinct content is emitted exactly once,
    * on first sight, and suppressed forever after (cross-micro-batch via
    * the state store). With arrival in id order this equals the batch
    * min-id survivor set ([[graft.ops.Dedup.exactSurvivors]]).
    */
  def survivorsStream(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("fp", fingerprint(col(textCol)))
      .dropDuplicates("fp")
      .drop("fp")
}
