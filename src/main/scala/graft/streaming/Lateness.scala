package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Watermark-TUNING audit: for each event-time hour, how many events
  * arrived more than `horizonSeconds` behind the max event time already
  * seen — exactly the rows a `withWatermark(ts, horizon)` pipeline would
  * drop. The readout that turns "pick a watermark" from folklore into a
  * measured trade (drop share vs state horizon). Arrival order is the
  * ingest id (`event_id` — the s11/s13 in-order contract).
  *
  * Scale shape: the running "max ts seen so far" is a PREFIX MAX over
  * arrival order — never computed as one global window. Two-level scan
  * (the classic distributed prefix pattern): per-bucket maxima
  * (arrival-id div bucketSize — one partial agg), an exclusive running
  * max over the tiny bucket table (bucket-count rows, one bounded
  * window task), then a within-bucket running max combined with the
  * bucket prefix by `greatest`. Max is associative, so the composition
  * is bit-equal to the global scan the SQL oracle runs.
  */
object Lateness {

  def watermarkLateness(
      events: DataFrame, horizonSeconds: Long = 7200L,
      bucketSize: Long = 4096L): DataFrame = {
    require(horizonSeconds >= 1, s"horizon must be positive: $horizonSeconds")
    require(bucketSize >= 2, s"bucketSize must be >= 2: $bucketSize")
    val e = events.select(col("event_id"), col("ts"),
      unix_micros(col("ts")).as("__tu"),
      expr(s"event_id div ${bucketSize}L").as("__bk"))
    val bmax = e.groupBy(col("__bk")).agg(max(col("__tu")).as("__bm"))
      .withColumn("__pre",
        max(col("__bm")).over(Window.orderBy(col("__bk").asc)
          .rowsBetween(Window.unboundedPreceding, -1)))
    val wIn = Window.partitionBy(col("__bk")).orderBy(col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.join(bmax.select(col("__bk"), col("__pre")), Seq("__bk"))
      .withColumn("__run",
        greatest(coalesce(col("__pre"), lit(Long.MinValue)),
          max(col("__tu")).over(wIn)))
      .select(date_trunc("hour", col("ts")).as("hour"),
        ((col("__run") - col("__tu")) >
          horizonSeconds * 1000000L).as("__late"),
        expr("(__run - __tu) div 1000000L").as("__lag_s"))
      .groupBy(col("hour"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("__late"), 1L).otherwise(0L)).as("n_would_drop"),
        max(col("__lag_s")).as("max_lag_s"))
      .withColumn("drop_share",
        round(col("n_would_drop").cast("double") /
          col("n_events").cast("double"), 6))
  }
}
