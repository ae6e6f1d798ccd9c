package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization: gap-based session assignment over an event log —
  * the batch counterpart of the streaming session windows (s02), and the
  * canonical "user journey" preprocessing step for behavioral training
  * data (grouping events into interaction episodes before packing them
  * into sequences).
  *
  * Semantics: per key, events ordered by (epoch-second, tiebreaker) start
  * a new session when the gap from the previous event exceeds
  * `gapSeconds`. Session ids are per-key ordinals (1, 2, ...), so the
  * output is deterministic and engine-portable: all arithmetic is integer
  * (epoch seconds via `unix_timestamp` == DuckDB `epoch_us // 1_000_000`
  * on the micros-precision test data; both truncate).
  *
  * Scale: one key-partitioned window (the per-user event history is the
  * unit of locality — exactly how a 100 TB event log is already bucketed
  * in practice). The lag + running-sum pair stays inside ONE window sort
  * per key; no self-join, no global order. A celebrity key serializes its
  * own history into one task — at billions of events per single key,
  * pre-split by (key, day) the way the as-of join's skew mode does and
  * stitch boundary sessions; for training-data corpora (human users) the
  * per-key bound is small.
  *
  * Output: (keyCol, session_id, n_events, t_start_s, t_end_s,
  * duration_s) — epochs as BIGINT seconds, never floats or timestamps
  * (the q32 contract: integer epochs survive every engine's timestamp
  * precision differences).
  */
object Sessions {

  def sessionize(
      events: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      gapSeconds: Long = 1800L): DataFrame = {
    require(gapSeconds >= 1, s"gapSeconds must be positive, got $gapSeconds")
    val es: Column = unix_timestamp(col(tsCol))
    val order = Window.partitionBy(col(keyCol))
      .orderBy(col("__es").asc, col(tieCol).asc)
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col(keyCol), col(tieCol), es.as("__es"))
      .withColumn("__prev", lag(col("__es"), 1).over(order))
      .withColumn("__brk",
        when(col("__prev").isNull ||
          col("__es") - col("__prev") > gapSeconds, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("__brk")).over(run))
      .groupBy(col(keyCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("__es")).as("t_start_s"),
        max(col("__es")).as("t_end_s"))
      .withColumn("duration_s", col("t_end_s") - col("t_start_s"))
  }
}
