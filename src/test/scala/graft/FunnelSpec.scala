package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Funnel

class FunnelSpec extends SparkSessionSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("funnel: chained-min semantics on hand-built users") {
    // u1 completes all 4 stages in order
    // u2 signup + view only
    // u3 view BEFORE its signup — chain must not count it (stops at 1)
    // u4 purchase BEFORE click — stops after click? no: click never
    //    happens, so u4 stops at stage 2 (signup, view)
    // u5 view at the SAME ts as signup — ties advance (ts >= t rule)
    val events = Seq(
      (1L, "signup", ts(0)), (1L, "view", ts(1)), (1L, "click", ts(2)),
      (1L, "purchase", ts(3)),
      (2L, "signup", ts(0)), (2L, "view", ts(5)),
      (3L, "view", ts(0)), (3L, "signup", ts(1)),
      (4L, "signup", ts(0)), (4L, "view", ts(1)), (4L, "purchase", ts(2)),
      (5L, "signup", ts(7)), (5L, "view", ts(7)),
      // noise type never rides the shuffle nor the chain
      (1L, "error", ts(1))
    ).toDF("user_id", "event_type", "ts")

    val got = Funnel
      .funnelStages(events, Seq("signup", "view", "click", "purchase"))
      .as[(Int, String, Long)].collect().toSet
    // reached >= stage: signup {1,2,3,4,5}, view {1,2,4,5}, click {1},
    // purchase {1}
    assert(got === Set(
      (1, "signup", 5L), (2, "view", 4L), (3, "click", 1L),
      (4, "purchase", 1L)))
  }

  test("funnel: later re-occurrence rescues an out-of-order stage") {
    // view precedes signup, but a SECOND view after signup keeps the
    // chain alive — chained-min picks min(view ts >= signup ts)
    val events = Seq(
      (1L, "view", ts(0)), (1L, "signup", ts(1)), (1L, "view", ts(2)),
      (1L, "click", ts(3))
    ).toDF("user_id", "event_type", "ts")
    val got = Funnel
      .funnelStages(events, Seq("signup", "view", "click"))
      .as[(Int, String, Long)].collect().toSet
    assert(got === Set((1, "signup", 1L), (2, "view", 1L), (3, "click", 1L)))
  }

  test("property: random event sets match a local chained-min replay (seeded)") {
    val rnd = new scala.util.Random(99)
    val types = Array("signup", "view", "click", "purchase", "noise")
    val stages = Seq("signup", "view", "click", "purchase")
    // small ts range FORCES same-ts collisions across types, exercising
    // the >= tie rule the single-walk formulation gets wrong
    val evs = for {
      u <- 0L until 40L
      _ <- 0 until rnd.nextInt(12)
    } yield (u, types(rnd.nextInt(types.length)), ts(rnd.nextInt(15)))

    def localStage(es: Seq[(Long, String, java.sql.Timestamp)]): Int = {
      var t: java.sql.Timestamp = null
      var stage = 0
      var go = true
      while (go && stage < stages.length) {
        val cand = es.filter(e => e._2 == stages(stage) &&
          (stage == 0 || !e._3.before(t))).map(_._3)
        if (cand.isEmpty) go = false
        else { t = cand.min((a: java.sql.Timestamp, b: java.sql.Timestamp) => a.compareTo(b)); stage += 1 }
      }
      stage
    }
    val perUser = evs.groupBy(_._1).view.mapValues(localStage).toMap
    val expected = (1 to 4).map(k =>
      k -> perUser.values.count(_ >= k).toLong).filter(_._2 > 0).toMap

    val got = Funnel
      .funnelStages(evs.toDF("user_id", "event_type", "ts"), stages)
      .as[(Int, String, Long)].collect()
      .map { case (st, _, n) => st -> n }.toMap
    assert(got === expected)
  }

  test("funnel matches the staged-min SQL formulation on real events") {
    val events = Engine.table(spark, sfDir, "events")
    val got = Funnel
      .funnelStages(events, Seq("signup", "view", "click", "purchase"))
      .as[(Int, String, Long)].collect()
      .map { case (st, _, n) => st -> n }.toMap

    // reference: chained joins (the 4-shuffle SQL shape)
    events.createOrReplaceTempView("fs_events")
    val ref = spark.sql(
      """WITH s1 AS (SELECT user_id, min(ts) AS t FROM fs_events
                     WHERE event_type = 'signup' GROUP BY 1),
          s2 AS (SELECT e.user_id, min(e.ts) AS t FROM fs_events e
                 JOIN s1 ON e.user_id = s1.user_id AND e.ts >= s1.t
                 WHERE e.event_type = 'view' GROUP BY 1),
          s3 AS (SELECT e.user_id, min(e.ts) AS t FROM fs_events e
                 JOIN s2 ON e.user_id = s2.user_id AND e.ts >= s2.t
                 WHERE e.event_type = 'click' GROUP BY 1),
          s4 AS (SELECT e.user_id, min(e.ts) AS t FROM fs_events e
                 JOIN s3 ON e.user_id = s3.user_id AND e.ts >= s3.t
                 WHERE e.event_type = 'purchase' GROUP BY 1)
          SELECT 1 AS stage, count(*) AS n FROM s1
          UNION ALL SELECT 2, count(*) FROM s2
          UNION ALL SELECT 3, count(*) FROM s3
          UNION ALL SELECT 4, count(*) FROM s4""")
      .as[(Int, Long)].collect().toMap
    assert(got === ref)
    // monotone non-increasing by construction; at sf0.001 the funnel may
    // not strictly narrow (every signup user converts)
    assert(got(1) >= got(4) && got(4) > 0)
  }
}
