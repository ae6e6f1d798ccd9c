package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-transition (Markov) counts maintained on the stream: per user,
  * each event's type paired with the PREVIOUS event's type (by event
  * time, event_id tie-break), counted into the from→to matrix — the
  * "what do users do next" readout, the streaming sibling of the s09
  * funnel. (The reference engine has no streaming surface; this extends
  * its event-processing coverage the same way s01–s10 do.)
  *
  * The per-user state is BOUNDED: the last-seen event's (ts, event_id,
  * type) plus at most |types|² counters — runnable forever (the s10
  * discipline). Emission is per-user count rows in Update mode;
  * [[matrixFromUsers]] merges them to the corpus matrix, exactly as s10
  * merges shard stats — so the heavy object (the user-level fold) stays
  * distributed and the merge is a partially-aggregated key groupBy.
  *
  * Ordering: WITHIN a micro-batch events sort by (ts, event_id); ACROSS
  * batches the fold trusts arrival order but REFUSES regressions — a
  * late event older than the last folded one is counted into the
  * `n_late_dropped` bucket instead of fabricating a backward transition
  * (the watermark trade made explicit in state). Under in-order arrival
  * (StreamingSpec's contract, any batch SPLIT) the quiet-period state
  * equals the batch lag-window form [[transitionMatrix]].
  */
object TransitionStream {

  case class TransEvent(user_id: Long, ts_us: Long, event_id: Long,
      event_type: String)

  /** Flat state: last folded event + packed "fromto" counter keys
    * (flat public case class — the StatsStream encoder lesson).
    */
  case class TransState(lastTs: Long, lastEid: Long, lastType: String,
      keys: Seq[String], counts: Seq[Long], lateDropped: Long)

  case class UserTransitions(user_id: Long, from_type: String,
      to_type: String, n: Long)

  /** Shared projection both forms consume. */
  def transEvents(df: DataFrame): Dataset[TransEvent] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("user_id"), expr("unix_micros(ts)").as("ts_us"),
        col("event_id"), col("event_type"))
      .as[TransEvent]
  }

  /** Streaming fold: per-user transition counts, re-emitted for touched
    * users each micro-batch (Update mode).
    */
  def userTransitions(events: Dataset[TransEvent]): Dataset[UserTransitions] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[TransState, UserTransitions](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        case (uid, it, state: GroupState[TransState]) =>
          var s = state.getOption.getOrElse(
            TransState(Long.MinValue, Long.MinValue, "", Seq.empty,
              Seq.empty, 0L))
          val m = scala.collection.mutable.LinkedHashMap.from(
            s.keys.zip(s.counts))
          var (lt, le, lty, late) = (s.lastTs, s.lastEid, s.lastType, s.lateDropped)
          it.toVector.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            if (e.ts_us < lt || (e.ts_us == lt && e.event_id < le)) late += 1
            else {
              if (lty.nonEmpty) {
                val k = lty + "\u0001" + e.event_type
                m.update(k, m.getOrElse(k, 0L) + 1L)
              }
              lt = e.ts_us; le = e.event_id; lty = e.event_type
            }
          }
          s = TransState(lt, le, lty, m.keys.toSeq, m.values.toSeq, late)
          state.update(s)
          m.iterator.map { case (k, n) =>
            val Array(f, t) = k.split('\u0001')
            UserTransitions(uid, f, t, n)
          }
      }
  }

  /** Merge per-user rows to the corpus from→to matrix with per-source
    * probabilities (round-6 of the exact integer division). The window
    * runs over the AGGREGATED matrix (≤ |types|² rows) — post-agg, not
    * a data-volume sort.
    */
  def matrixFromUsers(users: DataFrame): DataFrame = {
    val g = users.groupBy(col("from_type"), col("to_type"))
      .agg(sum(col("n")).as("n"))
    val wf = Window.partitionBy(col("from_type"))
    g.withColumn("p",
        round(col("n").cast("double") /
          sum(col("n")).over(wf).cast("double"), 6))
      .select(col("from_type"), col("to_type"), col("n"), col("p"))
  }

  /** Batch form: lag window + count — what the streaming fold must equal
    * under in-order arrival. One user-keyed sort window + one pair
    * groupBy; the probability window is post-aggregate.
    */
  def transitionMatrix(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val pairs = df
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("__prev", lag(col("event_type"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .select(col("__prev").as("from_type"),
        col("event_type").as("to_type"))
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val wf = Window.partitionBy(col("from_type"))
    pairs.withColumn("p",
        round(col("n").cast("double") /
          sum(col("n")).over(wf).cast("double"), 6))
      .select(col("from_type"), col("to_type"), col("n"), col("p"))
  }

  /** The sink mode [[userTransitions]] needs. */
  val outputMode: OutputMode = OutputMode.Update()
}
