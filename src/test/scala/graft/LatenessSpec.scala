package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.Engine.table
import graft.streaming.Lateness

class LatenessSpec extends SparkSessionSpec {
  import spark.implicits._

  test("hand case: lateness measured against the running max in arrival order") {
    def t(min: Int) = new Timestamp(86400000L + min * 60000L)
    // arrival order = event_id; event 3 is 3h behind the max seen (t(200))
    val ev = Seq(
      (1L, t(0)), (2L, t(200)), (3L, t(20)), (4L, t(210)))
      .toDF("event_id", "ts")
    val got = Lateness.watermarkLateness(ev, horizonSeconds = 7200L,
        bucketSize = 2L)
      .select(col("hour"), col("n_events"), col("n_would_drop"),
        col("max_lag_s"))
      .as[(Timestamp, Long, Long, Long)].collect()
      .map(r => r._1.getTime -> ((r._2, r._3, r._4))).toMap
    // t(0) and t(20) land in hour 0: t(20) arrived 180min late → dropped
    val h0 = got(86400000L)
    assert(h0 === ((2L, 1L, 10800L)))
    // the two high-ts events are never behind anything
    val h3 = got(86400000L + 180L * 60000L)
    assert(h3._2 === 0L)
  }

  test("two-level bucket prefix max == single global window (associativity), any bucket size") {
    val ev = table(spark, sfDir, "events")
      .select(col("event_id"), col("ts"))
    val small = Lateness.watermarkLateness(ev, 7200L, bucketSize = 64L)
      .collect().map(_.toSeq).toSet
    val big = Lateness.watermarkLateness(ev, 7200L, bucketSize = 100000L)
      .collect().map(_.toSeq).toSet
    assert(small === big)
    val shuffled = Lateness
      .watermarkLateness(ev.repartition(13), 7200L, bucketSize = 64L)
      .collect().map(_.toSeq).toSet
    assert(shuffled === small)
  }
}
