package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Engine.table
import graft.streaming.EventStream

/** Streaming-analytics query surface (batch-equivalent forms, so the
  * DuckDB oracle checks them; StreamingSpec proves the streaming forms
  * produce identical results through readStream + memory sink).
  */
object StreamQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s01_hourly_agg" -> ((s, dir) =>
      EventStream.hourlyAgg(table(s, dir, "events"))),

    "s02_sessions" -> ((s, dir) =>
      EventStream.sessionize(table(s, dir, "events"), gapMinutes = 30)),

    "s03_hourly_top_values" -> ((s, dir) =>
      EventStream.hourlyTopValues(table(s, dir, "events"), k = 3)),

    "s04_view_purchase_counts" -> ((s, dir) =>
      EventStream.viewPurchaseCounts(table(s, dir, "events"), windowMinutes = 60)),

    // Stream-static enrichment: events joined to the customer dimension
    // (broadcast — stateless in the streaming form), hourly per-segment
    // rollup. StreamingSpec proves the readStream form matches.
    "s05_segment_hourly" -> ((s, dir) =>
      EventStream.segmentHourly(
        table(s, dir, "events"), table(s, dir, "customer")))
  )

  val oracles: Map[String, String] = Map(
    "s01_hourly_agg" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
         count(*) AS n_events,
         CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2""",
    "s02_sessions" ->
      """WITH g AS (
           SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
           FROM events)
         SELECT user_id,
           CAST(sum(CASE WHEN prev_ts IS NULL
                    OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
           count(*) AS n_events
         FROM g GROUP BY user_id""",
    "s03_hourly_top_values" ->
      """SELECT hour, event_type, rk, event_id, value FROM (
           SELECT date_trunc('hour', ts) AS hour, event_type, event_id, value,
             row_number() OVER (PARTITION BY date_trunc('hour', ts), event_type
                                ORDER BY value DESC, event_id ASC) AS rk
           FROM events)
         WHERE rk <= 3""",
    "s04_view_purchase_counts" ->
      """SELECT p.event_id AS p_id, p.user_id, p.ts AS p_ts,
                count(*) AS n_views
         FROM events p JOIN events v
           ON p.user_id = v.user_id
          AND v.ts <= p.ts
          AND v.ts >= p.ts - INTERVAL 60 MINUTES
         WHERE p.event_type = 'purchase' AND v.event_type = 'view'
         GROUP BY 1, 2, 3""",
    "s05_segment_hourly" ->
      """SELECT date_trunc('hour', e.ts) AS hour, c.c_mktsegment,
         count(*) AS n_events,
         CAST(CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_value
         FROM events e JOIN customer c ON e.user_id = c.c_custkey
         GROUP BY 1, 2"""
  )
}
