package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Burst (rate-spike) detection maintained on the stream: per user, the
  * maximum number of events falling in any trailing `windowSeconds`
  * window — the abuse/anomaly readout a live ingest guard keys on
  * (the reference engine has no streaming surface; this extends its
  * event-processing coverage the same way s01–s13 do).
  *
  * The trailing window is measured at whole-second resolution over
  * per-second event counts: the burst value at second s is
  * Σ counts[s−W+1 .. s], and the per-user statistic is the max of that
  * sum over all seconds the user was active. Measuring at second
  * boundaries (not at raw event offsets) is what makes the fold's
  * state BOUNDED: the last-seen (ts, event_id) plus at most W
  * per-second counters — runnable forever (the s10/s11/s13
  * discipline). It is also what makes stream == batch exact: the batch
  * form's RANGE frame over the per-second aggregate sums the identical
  * seconds.
  *
  * Why the stream's running max equals the batch per-second max: events
  * fold in (ts, event_id) order, so once the fold moves past second s,
  * counts[s] never grows again; the LAST increment whose window ends at
  * s therefore sees the complete trailing sum for s, and every earlier
  * increment at s saw a smaller partial — the running max over
  * increments is the max over complete per-second sums.
  *
  * Ordering contract (s11/s13's, verbatim): WITHIN a micro-batch events
  * sort by (ts, event_id); ACROSS batches the fold trusts arrival order
  * but REFUSES regressions — a late event older than the last folded
  * one increments `n_late_dropped` instead of mutating an
  * already-closed second. Under in-order arrival (StreamingSpec's
  * contract, any batch split) the quiet-period state equals the batch
  * RANGE-window form [[burstBatch]].
  */
object BurstStream {

  case class BurstEvent(user_id: Long, ts_us: Long, event_id: Long)

  /** Flat state: last folded event, trailing per-second counters, the
    * running max (flat public case class — the StatsStream encoder
    * lesson).
    */
  case class BurstState(lastTs: Long, lastEid: Long, seen: Boolean,
      secs: Seq[Long], counts: Seq[Long], maxBurst: Long,
      lateDropped: Long)

  case class UserBurst(user_id: Long, max_burst: Long)

  /** Shared projection both forms consume. */
  def burstEvents(df: DataFrame): Dataset[BurstEvent] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("user_id"), expr("unix_micros(ts)").as("ts_us"),
        col("event_id"))
      .as[BurstEvent]
  }

  /** Streaming fold: per-user running max trailing-window count,
    * re-emitted for touched users each micro-batch (Update mode).
    */
  def userBursts(events: Dataset[BurstEvent],
      windowSeconds: Long = 60L): Dataset[UserBurst] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[BurstState, UserBurst](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        case (uid, it, state: GroupState[BurstState]) =>
          var s = state.getOption.getOrElse(
            BurstState(Long.MinValue, Long.MinValue, seen = false,
              Seq.empty, Seq.empty, 0L, 0L))
          val m = scala.collection.mutable.LinkedHashMap.from(
            s.secs.zip(s.counts))
          var (lt, le, seen, late, mb) =
            (s.lastTs, s.lastEid, s.seen, s.lateDropped, s.maxBurst)
          // running window total: rebuilt once per micro-batch (O(W)),
          // then maintained incrementally — the fold stays O(1) per
          // event instead of re-summing up to W counters each time
          var wsum = m.valuesIterator.sum
          it.toVector.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            if (seen && (e.ts_us < lt || (e.ts_us == lt && e.event_id < le)))
              late += 1
            else {
              val sec = e.ts_us / 1000000L
              // trailing prune keeps ≤ windowSeconds live counters
              m.filterInPlace { (k, c) =>
                val keep = k > sec - windowSeconds
                if (!keep) wsum -= c
                keep
              }
              m.update(sec, m.getOrElse(sec, 0L) + 1L)
              wsum += 1L
              if (wsum > mb) mb = wsum
              lt = e.ts_us; le = e.event_id; seen = true
            }
          }
          s = BurstState(lt, le, seen, m.keys.toSeq, m.values.toSeq,
            mb, late)
          state.update(s)
          if (seen) Iterator.single(UserBurst(uid, mb)) else Iterator.empty
      }
  }

  /** Batch form: per-(user, second) counts, a RANGE-framed trailing sum
    * over the per-second aggregate, max per user — what the streaming
    * fold must equal under in-order arrival. The RANGE window runs over
    * the per-second AGGREGATE (≤ one row per active second), never the
    * raw event stream.
    */
  def burstBatch(df: DataFrame, windowSeconds: Long = 60L,
      threshold: Long = 5L): DataFrame = {
    val ps = df
      .select(col("user_id"), unix_timestamp(col("ts")).as("__t"))
      .groupBy(col("user_id"), col("__t"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("__t").asc)
      .rangeBetween(-(windowSeconds - 1), Window.currentRow)
    ps.withColumn("__r", sum(col("__c")).over(w))
      .groupBy(col("user_id"))
      .agg(max(col("__r")).as("max_burst"))
      .select(col("user_id"), col("max_burst"),
        (col("max_burst") >= threshold).as("is_burst"))
  }

  /** The sink mode [[userBursts]] needs. */
  val outputMode: OutputMode = OutputMode.Update()
}
