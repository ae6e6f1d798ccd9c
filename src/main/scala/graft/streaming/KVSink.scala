package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.kv.{Mem, Store}

/** Streaming → KV bridge: the reference README's "memory vs store option"
  * (/root/reference/README.md:20) applied to streaming sinks — a
  * streaming computation's rolling result lives in `mem` (ephemeral,
  * cached) or `store` (durable, bucketed parquet), behind the same
  * upsert contract, so the engine's two halves (KV services, streaming
  * analytics) compose instead of coexisting.
  *
  * Each update-mode micro-batch upserts its changed rows by key: the KV
  * layer's last-write-wins IS the streaming state fold, so after any
  * prefix of batches the sink holds exactly the latest aggregate per key
  * — the same rows the equivalent batch query would produce over the
  * data so far (KVSinkSpec proves stream==batch through both sinks).
  *
  * Scale shape: an update-mode micro-batch carries only the keys that
  * changed, and `Store.put` rewrites only the buckets those keys hash
  * into — sink I/O per batch is O(changed keys), not O(stored keys).
  */
object KVSink {

  /** Run `df` (a streaming DataFrame, typically an update-mode aggregate)
    * into a [[Store]] gid keyed by `keyCol`.
    */
  def toStore(df: DataFrame, store: Store, gid: String, keyCol: String,
      checkpointDir: String): StreamingQuery =
    start(df, checkpointDir) { batch =>
      store.put(batch, gid, Some(keyCol))
    }

  /** Same contract into a [[Mem]] group — the ephemeral option. */
  def toMem(df: DataFrame, mem: Mem, gid: String, keyCol: String,
      checkpointDir: String): StreamingQuery =
    start(df, checkpointDir) { batch =>
      mem.put(batch, gid, Some(keyCol))
    }

  private def start(df: DataFrame, checkpointDir: String)(
      put: DataFrame => Unit): StreamingQuery =
    df.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        // an empty micro-batch must not touch the store (a put would
        // needlessly create/stamp the gid)
        if (!batch.isEmpty) put(batch)
      }
      .start()
}
