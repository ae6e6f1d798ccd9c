package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.mr.MapReduce

/** Earliest-chain funnel analysis: how many users progressed through an
  * ordered sequence of event types (signup → view → click → purchase),
  * where stage k+1 counts only if it happens at-or-after the EARLIEST
  * qualifying stage-k event (t₁ = min ts of stage 1; tₖ₊₁ = min ts ≥ tₖ
  * of stage k+1) — the standard product-analytics conversion funnel.
  *
  * Spark shape: the SQL formulation is k chained join+min stages — k
  * shuffles of the event table. This implementation instead pays ONE
  * shuffle: events (filtered to funnel types before the exchange) group
  * by user through the typed MR layer ([[graft.mr.MapReduce.exec]]),
  * and the chain recurrence runs in-memory per user, where the group is
  * bounded by a user's own event count — the same per-group-bounded
  * contract sessionization (s02) relies on. At 100 TB the win is k−1
  * fewer full-table exchanges; the reduce streams groups, never the
  * whole partition.
  *
  * The streaming form lives in
  * [[graft.streaming.EventStream.funnelStageStream]] — same chain
  * kernel ([[chainStage]]), state-backed per user.
  */
object Funnel {

  /** (getTime millis, getNanos) orders sub-millisecond events correctly;
    * plain getTime would collapse them.
    */
  private[graft] implicit val tsOrdering: Ordering[Timestamp] =
    Ordering.by(t => (t.getTime, t.getNanos))

  /** The chain recurrence over one user's funnel-type events: highest
    * stage reached under the earliest-chain rule. Shared by the batch
    * reduce and the streaming state timeout — one definition of the
    * semantics.
    */
  private[graft] def chainStage(
      events: Iterable[(String, Timestamp)], stageArr: Array[String]): Int = {
    val byType: Map[String, Array[Timestamp]] =
      events.groupBy(_._1).map { case (t, a) =>
        t -> a.map(_._2).toArray.sorted
      }
    var stage = 0
    var tCur: Timestamp = null
    var advanced = true
    while (advanced && stage < stageArr.length) {
      val ts = byType.getOrElse(stageArr(stage), Array.empty[Timestamp])
      // sorted, so the first qualifying element IS min(ts ≥ tCur)
      val hit =
        if (stage == 0) ts.headOption
        else ts.find(t => !t.before(tCur))
      hit match {
        case Some(t) => tCur = t; stage += 1
        case None => advanced = false
      }
    }
    stage
  }

  /** Per-user funnel stage: (user_id, highest stage reached ∈ [0, k]).
    * Users with no funnel-type events are absent; a user whose chain
    * never starts (no stage-1 event) reports 0.
    */
  def perUserStages(
      events: DataFrame, stages: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts"): Dataset[(Long, Int)] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val spark = events.sparkSession
    import spark.implicits._
    val stageArr = stages.toArray
    val stageSet = stageArr.toSet
    val typed = events
      .select(col(userCol).cast("long"), col(typeCol), col(tsCol))
      .as[(Long, String, Timestamp)]
    MapReduce.exec(typed)(e =>
      // non-funnel types never ride the shuffle
      if (stageSet.contains(e._2)) Iterator.single((e._1, (e._2, e._3)))
      else Iterator.empty) { (user, it) =>
      (user, chainStage(it.toSeq, stageArr))
    }
  }

  /** Funnel summary: one row per stage — (stage, stage_name, n_users
    * reaching stage or beyond). Cumulative counts come from a sequence
    * explode over each user's max stage: a k-row-per-user narrow op,
    * not another pass over events.
    */
  def funnelStages(
      events: DataFrame, stages: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    val stageArr = stages.toArray
    val names = array(stageArr.map(lit).toIndexedSeq: _*)
    perUserStages(events, stages, userCol, typeCol, tsCol)
      .toDF("user_id", "max_stage")
      .filter(col("max_stage") >= 1)
      .select(explode(sequence(lit(1), col("max_stage"))).as("stage"))
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_users"))
      .select(col("stage"), element_at(names, col("stage")).as("stage_name"),
        col("n_users"))
  }
}
