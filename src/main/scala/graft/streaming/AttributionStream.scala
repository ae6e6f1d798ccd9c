package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Last-touch revenue attribution maintained on the stream: each
  * purchase credits its `value` to the user's most recent preceding
  * non-purchase event type ('direct' when none) — the revenue-weighted
  * sibling of q72's count-only attribution, folded per user with
  * flatMapGroupsWithState. (The reference engine has no streaming
  * surface; this extends its event-processing coverage the s01–s11 way.)
  *
  * Per-user state is BOUNDED: the last folded (ts, event_id), the
  * current touch type, and at most |types|+1 (touch → count, micros)
  * counters — runnable forever (the s10 discipline). Money rides as
  * exact integer MICROS: the fold applies the same HALF_UP scale-6
  * decimal cast Spark's `cast(value as DECIMAL(18,6))` performs, so the
  * integer sums equal the batch form's decimal sums bit-for-bit, and
  * only the final report divides into a double.
  *
  * Ordering: within a micro-batch events sort by (ts, event_id); across
  * batches the fold trusts arrival order but REFUSES regressions into
  * `n_late_dropped` (the s11 contract). Under in-order arrival the
  * quiet-period state equals the batch window form
  * [[lastTouchAttribution]].
  */
object AttributionStream {

  case class AttrEvent(user_id: Long, ts_us: Long, event_id: Long,
      event_type: String, value: Double)

  /** Flat state (the StatsStream encoder lesson): parallel key/count/
    * micros seqs, not a Map.
    */
  case class AttrState(lastTs: Long, lastEid: Long, lastTouch: String,
      keys: Seq[String], counts: Seq[Long], micros: Seq[Long],
      lateDropped: Long)

  case class UserAttribution(user_id: Long, touch_type: String,
      n: Long, value_micros: Long)

  /** Shared projection both forms consume. */
  def attrEvents(df: DataFrame): Dataset[AttrEvent] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("user_id"), expr("unix_micros(ts)").as("ts_us"),
        col("event_id"), col("event_type"), col("value"))
      .as[AttrEvent]
  }

  /** The exact integer-micros image of Spark's double→DECIMAL(18,6)
    * cast (java BigDecimal HALF_UP at scale 6 — what Catalyst's Cast
    * does), so fold sums equal batch decimal sums exactly. Catalyst
    * routes double→decimal through scala BigDecimal(d), which wraps
    * java BigDecimal.valueOf(d) — the SHORTEST-string image of the
    * double, not its exact binary expansion — so valueOf here too:
    * `new BigDecimal(d)` can round the other way on half-ulp
    * boundaries at scale 6.
    */
  private def toMicros(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  /** Streaming fold: per-user attribution counters, re-emitted for
    * touched users each micro-batch (Update mode).
    */
  def userAttributions(events: Dataset[AttrEvent]): Dataset[UserAttribution] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[AttrState, UserAttribution](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        case (uid, it, state: GroupState[AttrState]) =>
          var s = state.getOption.getOrElse(
            AttrState(Long.MinValue, Long.MinValue, "", Seq.empty,
              Seq.empty, Seq.empty, 0L))
          val cnt = scala.collection.mutable.LinkedHashMap.from(
            s.keys.zip(s.counts))
          val mic = scala.collection.mutable.LinkedHashMap.from(
            s.keys.zip(s.micros))
          var (lt, le, touch, late) =
            (s.lastTs, s.lastEid, s.lastTouch, s.lateDropped)
          it.toVector.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            if (e.ts_us < lt || (e.ts_us == lt && e.event_id < le)) late += 1
            else {
              if (e.event_type == "purchase") {
                val k = if (touch.isEmpty) "direct" else touch
                cnt.update(k, cnt.getOrElse(k, 0L) + 1L)
                mic.update(k, mic.getOrElse(k, 0L) + toMicros(e.value))
              } else touch = e.event_type
              lt = e.ts_us; le = e.event_id
            }
          }
          s = AttrState(lt, le, touch, cnt.keys.toSeq, cnt.values.toSeq,
            cnt.keys.toSeq.map(k => mic.getOrElse(k, 0L)), late)
          state.update(s)
          cnt.iterator.map { case (k, n) =>
            UserAttribution(uid, k, n, mic.getOrElse(k, 0L))
          }
      }
  }

  /** Merge per-user rows to the corpus attribution report. Micros sum as
    * integers; the single double division happens at report time.
    */
  def reportFromUsers(users: DataFrame): DataFrame =
    users.groupBy(col("touch_type"))
      .agg(sum(col("n")).as("n_purchases"),
        sum(col("value_micros")).as("__m"))
      .select(col("touch_type"), col("n_purchases"),
        round(col("__m").cast("double") / lit(1e6), 6)
          .as("attributed_value"))

  /** Batch form: the q72 ignore-nulls running last_value, plus exact
    * DECIMAL(18,6) value sums — what the streaming fold must equal
    * under in-order arrival.
    */
  def lastTouchAttribution(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"), col("value"))
      .withColumn("__touch",
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("__touch"), lit("direct")).as("touch_type"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("value").cast(DecimalType(18, 6)))
          .cast(DecimalType(38, 6)).as("__v"))
      .select(col("touch_type"), col("n_purchases"),
        round(col("__v").cast("double"), 6).as("attributed_value"))
  }

  /** The sink mode [[userAttributions]] needs. */
  val outputMode: OutputMode = OutputMode.Update()
}
