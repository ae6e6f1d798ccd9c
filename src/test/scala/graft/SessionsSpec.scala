package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Sessions}

/** Batch sessionization (q42) and time-windowed event dedup (d11):
  * hand-computed replays of the gap/bucket rules plus partition
  * invariance — the properties the DuckDB oracles then re-verify at
  * sf scale.
  */
class SessionsSpec extends SparkSessionSpec {
  import spark.implicits._

  private def ev(id: Long, user: Long, sec: Long): (Long, Long, Timestamp) =
    (id, user, new Timestamp(sec * 1000L))

  test("gap rule splits sessions; per-session stats are exact") {
    val df = Seq(
      ev(1, 1, 1000), ev(2, 1, 1100), // session 1 of user 1
      ev(3, 1, 4000), ev(4, 1, 4100), // gap 2900 > 1800 → session 2
      ev(5, 2, 500)                   // lone event, lone session
    ).toDF("event_id", "user_id", "ts")
    val got = Sessions.sessionize(df, "user_id", "ts", "event_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(got === Map(
      (1L, 1L) -> ((2L, 1000L, 1100L, 100L)),
      (1L, 2L) -> ((2L, 4000L, 4100L, 100L)),
      (2L, 1L) -> ((1L, 500L, 500L, 0L))))
  }

  test("gap boundary: exactly gapSeconds stays in-session, one more breaks") {
    val df = Seq(ev(1, 1, 0), ev(2, 1, 1800), ev(3, 1, 3601))
      .toDF("event_id", "user_id", "ts")
    // 1800 - 0 = gap → same session; 3601 - 1800 = 1801 > 1800 → break
    val got = Sessions.sessionize(df, "user_id", "ts", "event_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._2 -> r._3).toMap
    assert(got === Map(1L -> 2L, 2L -> 1L))
  }

  test("sessionize is partition-invariant") {
    val df = (1L to 200L).map(i => ev(i, i % 7, i * 600)).toDF(
      "event_id", "user_id", "ts")
    val a = Sessions.sessionize(df.repartition(1), "user_id", "ts", "event_id")
      .collect().toSet
    val b = Sessions.sessionize(df.repartition(8), "user_id", "ts", "event_id")
      .collect().toSet
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("windowed dedup: earliest keeper per bucket, cross-bucket repeats survive") {
    val df = Seq(
      ev(1, 1, 100), ev(2, 1, 200), // same (user, type, hour): collapse to 1
      ev(3, 1, 3700),               // next hour bucket: survives on its own
      ev(4, 2, 150)                 // different user
    ).toDF("event_id", "user_id", "ts").withColumn("event_type", lit("x"))
    val got = Dedup.windowedSurvivors(
        df, Seq("user_id", "event_type"), "ts", "event_id")
      .select("event_id", "bucket", "n_copies")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 0L, 2L), (3L, 1L, 1L), (4L, 0L, 1L)))
  }

  test("windowed dedup keeps all original columns for survivors") {
    val df = Seq(ev(1, 1, 100), ev(2, 1, 200))
      .toDF("event_id", "user_id", "ts")
      .withColumn("event_type", lit("x"))
      .withColumn("payload", col("event_id") * 10)
    val got = Dedup.windowedSurvivors(
      df, Seq("user_id", "event_type"), "ts", "event_id")
    assert(got.columns.toSet ===
      Set("event_id", "user_id", "ts", "event_type", "payload",
        "bucket", "n_copies"))
    assert(got.select("payload").as[Long].collect().toSeq === Seq(10L))
  }
}
