package graft.streaming

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Recurring tasks — the engine analog of the reference's `gossip.at`
  * (distribution/all/gossip.js:168-175, its only recurring-execution
  * construct; `gossip.del` clears the interval).
  *
  * The reference schedules with a node-local `setInterval`; a raw timer
  * thread would be the literal translation but lives outside the
  * engine's lifecycle. Instead the task rides a rate-source streaming
  * query: one invocation per processing-time trigger, stopped/restarted
  * with the engine, visible in `spark.streams`, and — unlike
  * setInterval — non-overlapping by construction (micro-batches of one
  * query never run concurrently), which is the semantics a periodic
  * re-shard/compaction/gossip-round actually wants.
  */
object Periodic {

  /** Run `task` every `intervalMs` (processing time) until the returned
    * query is stopped ([[stop]] = the reference's `gossip.del`). The
    * task receives the micro-batch id (0, 1, 2, …).
    */
  def at(spark: SparkSession, intervalMs: Long)(
      task: Long => Unit): StreamingQuery =
    spark.readStream.format("rate")
      // ≥1 row per trigger keeps batches non-degenerate at any interval;
      // the payload is ignored — the TRIGGER is the construct
      .option("rowsPerSecond", math.max(1L, 1000L / math.max(1L, intervalMs)))
      .load()
      .writeStream
      .trigger(Trigger.ProcessingTime(intervalMs))
      .foreachBatch { (_: Dataset[Row], batchId: Long) => task(batchId) }
      .start()

  /** `gossip.del`: stop a periodic task. */
  def stop(q: StreamingQuery): Unit = q.stop()
}
