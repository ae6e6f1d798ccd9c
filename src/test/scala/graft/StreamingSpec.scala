package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.Engine.table
import graft.streaming.EventStream

class StreamingSpec extends SparkSessionSpec {
  import spark.implicits._

  test("streaming hourly agg == batch hourly agg (complete mode)") {
    val events = table(spark, sfDir, "events")
    val batch = EventStream.hourlyAgg(events)
      .collect().map(_.toSeq).toSet

    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    val streamDf = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val rows = events
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[(Long, Timestamp, Long, String, Double)].collect()
    mem.addData(rows.toSeq)

    // complete-mode aggregation (no watermark) over the same plan shape
    val agg = EventStream.hourlyAgg(streamDf)
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("hourly_out").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("hourly_out").collect().map(_.toSeq).toSet
    assert(streamed === batch)
  }

  test("stream-static enrichment == batch join (broadcast dim, complete mode)") {
    val events = table(spark, sfDir, "events")
    val customers = table(spark, sfDir, "customer")
    val batch = EventStream.segmentHourly(events, customers)
      .collect().map(_.toSeq).toSet

    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    val streamDf = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val rows = events
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[(Long, Timestamp, Long, String, Double)].collect()
    mem.addData(rows.toSeq)

    val agg = EventStream.segmentHourly(streamDf, customers)
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("seg_out").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("seg_out").collect().map(_.toSeq).toSet
    assert(streamed === batch)
  }

  test("streaming sliding agg == batch sliding agg (complete mode)") {
    val events = table(spark, sfDir, "events")
    val batch = EventStream.slidingAgg(events).collect().map(_.toSeq).toSet

    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    val streamDf = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val rows = events
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[(Long, Timestamp, Long, String, Double)].collect()
    mem.addData(rows.toSeq)

    val agg = EventStream.slidingAgg(streamDf)
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("sliding_out").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sliding_out").collect().map(_.toSeq).toSet
    assert(streamed === batch)
  }

  test("watermarked sliding windows emit once closed, all 6 overlaps") {
    val mem = MemoryStream[(Timestamp, String, Double)](spark)
    def t(min: Int) = new Timestamp(3600L * 1000 * 24 + min * 60000L)
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val agg = EventStream.slidingAggStream(
      df.withColumn("event_id", lit(0L)).withColumn("user_id", lit(0L))
        .withColumn("props", lit("")))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("sliding_wm_out").start()
    mem.addData(Seq((t(30), "click", 1.0)))
    q.processAllAvailable()
    // push the watermark far past every window containing t(30)
    mem.addData(Seq((t(60 * 24), "click", 9.0)))
    q.processAllAvailable()
    mem.addData(Seq((t(60 * 36), "click", 9.0)))
    q.processAllAvailable()
    q.stop()
    // the t(30) event must have been emitted in exactly 6 hourly-sliding
    // 6-hour windows
    val out = spark.table("sliding_wm_out")
      .filter(col("sum_value") === 1.0)
      .select("w_start").as[Timestamp].collect()
    assert(out.length === 6)
  }

  test("watermarked append-mode windows emit once closed") {
    val mem = MemoryStream[(Timestamp, String, Double)](spark)
    def t(min: Int) = new Timestamp(3600L * 1000 * 24 + min * 60000L)
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val agg = EventStream.hourlyAggStream(
      df.withColumn("event_id", lit(0L)).withColumn("user_id", lit(0L))
        .withColumn("props", lit("")))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wm_out").start()
    mem.addData(Seq((t(0), "click", 1.0), (t(30), "click", 2.0)))
    q.processAllAvailable()
    // advance event time far past the watermark → first window closes
    mem.addData(Seq((t(60 * 5), "click", 9.0)))
    q.processAllAvailable()
    mem.addData(Seq((t(60 * 10), "click", 9.0)))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("wm_out")
      .select("n_events").as[Long].collect()
    assert(out.contains(2L)) // the closed first window, both events in it
  }

  test("stream-stream interval join matches batch interval join") {
    val events = table(spark, sfDir, "events")
      .filter(col("user_id") < 50) // bounded slice keeps the test fast
    val batch = EventStream.viewPurchaseJoin(events, windowMinutes = 60)
      .select("p_id", "v_id").as[(Long, Long)].collect().toSet

    def side(tpe: String) = {
      val mem = MemoryStream[(Long, Timestamp, Long)](spark)
      val rows = events.filter(col("event_type") === tpe)
        .select("event_id", "ts", "user_id")
        .as[(Long, Timestamp, Long)].collect()
      mem.addData(rows.toSeq)
      (mem, mem.toDF().toDF("event_id", "ts", "user_id"))
    }
    val (_, p) = side("purchase")
    val (_, v) = side("view")
    val q = EventStream.viewPurchaseJoinStream(p, v, windowMinutes = 60)
      .writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ssj_out")
      .select("p_id", "v_id").as[(Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("stream-stream LEFT OUTER join matches batch: matches AND watermark-final orphans") {
    val events = table(spark, sfDir, "events")
      .filter(col("user_id") < 50) // bounded slice keeps the test fast
    val batch = EventStream.viewPurchaseLeftOuter(events, windowMinutes = 60)
      .select(col("p_id"), coalesce(col("v_id"), lit(-1L)))
      .as[(Long, Long)].collect().toSet

    // a NULL-matched purchase only emits once the watermark passes its
    // horizon, so push a far-future sentinel through BOTH sides to
    // finalize every real row's verdict, then exclude the sentinel
    val horizon = new Timestamp(
      events.agg(max(col("ts"))).as[Timestamp].head().getTime
        + 30L * 24 * 3600 * 1000)
    def side(tpe: String) = {
      val mem = MemoryStream[(Long, Timestamp, Long)](spark)
      val rows = events.filter(col("event_type") === tpe)
        .select("event_id", "ts", "user_id")
        .as[(Long, Timestamp, Long)].collect()
      mem.addData(rows.toSeq)
      mem.addData(Seq((-1L, horizon, -1L))) // watermark sentinel
      (mem, mem.toDF().toDF("event_id", "ts", "user_id"))
    }
    val (_, p) = side("purchase")
    val (_, v) = side("view")
    val q = EventStream.viewPurchaseLeftOuterStream(p, v, windowMinutes = 60)
      .writeStream.outputMode("append")
      .format("memory").queryName("ssloj_out").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ssloj_out")
      .filter(col("p_id") =!= -1L)
      .select(col("p_id"), coalesce(col("v_id"), lit(-1L)))
      .as[(Long, Long)].collect().toSet
    assert(streamed === batch)
    // the slice must actually contain both orphans and matches
    assert(batch.exists(_._2 == -1L) && batch.exists(_._2 != -1L))
  }

  test("streaming funnel stages == batch per-user stages at quiet finality") {
    val stages = Seq("signup", "view", "click", "purchase")
    val events = table(spark, sfDir, "events").filter(col("user_id") < 50)
    val batch = graft.ops.Funnel.perUserStages(events, stages)
      .collect().toSet

    // quiet window longer than the data span → each user finalizes
    // exactly once, at the sentinel-advanced watermark (global funnel,
    // the batch semantics)
    val quietMin = 500L * 24 * 60
    val horizon = new Timestamp(
      events.agg(max(col("ts"))).as[Timestamp].head().getTime
        + 1001L * 24 * 3600 * 1000)
    val mem = MemoryStream[(Long, String, Timestamp)](spark)
    mem.addData(events.select("user_id", "event_type", "ts")
      .as[(Long, String, Timestamp)].collect().toSeq)
    mem.addData(Seq((-1L, "signup", horizon)))
    val q = EventStream.funnelStageStream(
        spark, mem.toDF().toDF("user_id", "event_type", "ts"),
        stages, quietMinutes = quietMin)
      .toDF("user_id", "stage")
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_stream_out").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("funnel_stream_out")
      .filter(col("user_id") =!= -1L)
      .as[(Long, Int)].collect().toSet
    assert(streamed === batch)
    // at sf0.001 every sliced user converts — stage diversity is covered
    // by FunnelSpec's seeded property; here finality+equality is the claim
    assert(batch.nonEmpty && batch.exists(_._2 == 4))
  }

  test("streaming dedup removes injected duplicates") {
    val mem = MemoryStream[(Long, Timestamp, Long)](spark)
    val rows = table(spark, sfDir, "events")
      .filter(col("user_id") < 50)
      .select("event_id", "ts", "user_id")
      .as[(Long, Timestamp, Long)].collect()
    mem.addData(rows.toSeq)
    mem.addData(rows.toSeq) // replay: every event arrives twice
    val dedup = EventStream.dedupStream(
      mem.toDF().toDF("event_id", "ts", "user_id"), Seq("event_id"))
    val q = dedup.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dedup_out").select("event_id").as[Long].collect()
    assert(out.length === rows.length)
    assert(out.toSet === rows.map(_._1).toSet)
  }

  test("streaming content-dedup state == batch groups, stats derive (s06)") {
    val docs = table(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    val planted = docs.unionAll(docs.select(
      (col("doc_id") + 10000).as("doc_id"), col("lang"), col("text")))
    val batchGroups = graft.streaming.DedupStream
      .groups(planted, "text", "doc_id", "lang")
      .collect().map(_.toSeq).toSet
    val batchStats = graft.streaming.DedupStream
      .stats(planted, "text", "doc_id", "lang")
      .collect().map(_.toSeq).toSet

    val mem = MemoryStream[(Long, String, String)](spark)
    val sdf = mem.toDF().toDF("doc_id", "lang", "text")
    val q = graft.streaming.DedupStream.groups(sdf, "text", "doc_id", "lang")
      .writeStream.outputMode("complete")
      .format("memory").queryName("s06_groups").start()
    // originals in micro-batch 1, their twins in micro-batch 2: the
    // per-(lang, fp) state must merge ACROSS batches (min/count are
    // order-insensitive, so the final state is arrival-order-free)
    val orig = docs.as[(Long, String, String)].collect()
    mem.addData(orig.toSeq)
    q.processAllAvailable()
    mem.addData(orig.map { case (id, l, t) => (id + 10000, l, t) }.toSeq)
    q.processAllAvailable()
    q.stop()
    val streamedGroups = spark.table("s06_groups").collect().map(_.toSeq).toSet
    assert(streamedGroups === batchGroups)
    // the monitoring stats derived from the live state == the s06 batch
    // form — what a pipeline dashboard reads off the sink
    val derived = spark.table("s06_groups")
      .groupBy("lang")
      .agg(sum("n_copies").as("n_docs"), count(lit(1)).as("n_distinct"),
        (sum("n_copies") - count(lit(1))).as("n_dups"))
      .collect().map(_.toSeq).toSet
    assert(derived === batchStats)
  }

  test("streaming first-arrival survivors == batch min-id survivors") {
    val docs = table(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    val planted = docs.unionAll(docs.select(
      (col("doc_id") + 10000).as("doc_id"), col("lang"), col("text")))
    val batchIds = graft.ops.Dedup.exactSurvivors(planted, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet

    val mem = MemoryStream[(Long, String, String)](spark)
    val sdf = mem.toDF().toDF("doc_id", "lang", "text")
    val q = graft.streaming.DedupStream.survivorsStream(sdf, "text")
      .writeStream.outputMode("append")
      .format("memory").queryName("s06_surv").start()
    // arrival in id order (originals, then twins): first-arrival ==
    // min-id, and the twins must be suppressed by CROSS-batch state
    val orig = docs.as[(Long, String, String)].collect()
    mem.addData(orig.toSeq)
    q.processAllAvailable()
    mem.addData(orig.map { case (id, l, t) => (id + 10000, l, t) }.toSeq)
    q.processAllAvailable()
    q.stop()
    val streamedIds = spark.table("s06_surv")
      .select("doc_id").as[Long].collect().toSet
    assert(streamedIds === batchIds)
    assert(streamedIds.nonEmpty)
  }

  test("streaming sessionization closes sessions on event-time timeout") {
    val mem = MemoryStream[(Long, Timestamp, Long)](spark)
    def t(min: Int) = new Timestamp(3600L * 1000 * 24 + min * 60000L)
    val df = mem.toDF().toDF("user_id", "ts", "event_id")
    val out = EventStream.sessionizeStream(spark, df, gapMinutes = 30)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    // user 1: events at 0,10,20 (one session), then 120 (new session)
    mem.addData(Seq((1L, t(0), 1L), (1L, t(10), 2L), (1L, t(20), 3L)))
    q.processAllAvailable()
    mem.addData(Seq((1L, t(120), 4L)))
    q.processAllAvailable()
    // push watermark far ahead so the second session times out too
    mem.addData(Seq((2L, t(600), 5L)))
    q.processAllAvailable()
    mem.addData(Seq((2L, t(1200), 6L)))
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("sess_out")
      .select("user_id", "n_events").as[(Long, Int)].collect().toSet
    assert(sessions.contains((1L, 3))) // first session: 3 events
    assert(sessions.contains((1L, 1))) // second session: 1 event
  }

  test("batch sessionize matches hand-computed sessions") {
    def t(min: Int) = new Timestamp(min * 60000L)
    val ev = Seq(
      (1L, t(0), 10L, "click", 0.0, ""),
      (1L, t(10), 11L, "click", 0.0, ""),
      (1L, t(60), 12L, "click", 0.0, ""), // gap 50min > 30 → new session
      (2L, t(0), 13L, "view", 0.0, "")
    ).toDF("user_id", "ts", "event_id", "event_type", "value", "props")
    val out = EventStream.sessionize(ev, 30)
      .select("user_id", "n_sessions", "n_events")
      .as[(Long, Long, Long)].collect().toMap2
    assert(out(1L) === ((2L, 3L)))
    assert(out(2L) === ((1L, 1L)))
  }

  test("streaming shard stats state == batch form under shuffled multi-batch arrival (s10)") {
    import graft.streaming.StatsStream
    val events = table(spark, sfDir, "events")
    val cols = Seq("event_id", "user_id")
    val batch = StatsStream.statsFromEvents(
        StatsStream.statEvents(events, "event_id", cols, nBuckets = 8))
      .collect().map(_.toSeq).toSet

    val mem = MemoryStream[(Long, Long)](spark)
    val streamDf = mem.toDF().toDF("event_id", "user_id")
    // worst-case arrival: reversed id order, split across three batches
    val rows = events.select("event_id", "user_id")
      .as[(Long, Long)].collect().sortBy(-_._1)
    val thirds = rows.grouped(math.max(rows.length / 3, 1)).toSeq
    val out = StatsStream.shardStatsStream(streamDf, "event_id", cols)
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("s10_out").start()
    thirds.foreach { part =>
      mem.addData(part.toSeq)
      q.processAllAvailable()
    }
    q.stop()
    // update mode re-emits a group each batch it is touched in: the
    // LAST emission per (col, bucket) is the quiet-period state
    val sink = spark.table("s10_out")
      .withColumn("__seq", monotonically_increasing_id())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("col_name"), col("bucket"))
      .orderBy(col("__seq").desc)
    val finalState = sink.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__seq", "__rn")
      .collect().map(_.toSeq).toSet
    assert(finalState === batch)

    // merging the shard rows reproduces q46's global catalog row for
    // the long columns (the same KMV merge the batch op relies on)
    val merged = graft.ops.Profile.mergeableStats(
        events, "event_id", cols, nBuckets = 8)
      .as[(String, Long, Long, Double, String, String)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._5, r._6))).toMap
    val fromShards = StatsStream.statsFromEvents(
        StatsStream.statEvents(events, "event_id", cols, nBuckets = 8))
      .groupBy(col("col_name"))
      .agg(sum(col("n_rows")).as("r"), sum(col("n_nulls")).as("n"),
        min(col("min_val")).cast("string").as("mn"),
        max(col("max_val")).cast("string").as("mx"))
      .as[(String, Long, Long, String, String)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(fromShards === merged)
  }

  test("streaming transition fold == batch lag matrix under in-order splits (s11)") {
    import graft.streaming.TransitionStream
    val events = table(spark, sfDir, "events")
    val batch = TransitionStream.transitionMatrix(events)
      .collect().map(_.toSeq).toSet

    val mem = MemoryStream[(Long, Long, Long, String)](spark)
    val streamDf = mem.toDF()
      .toDF("user_id", "ts_us", "event_id", "event_type")
    // in-order arrival (the documented contract), split across batches
    val rows = TransitionStream.transEvents(events).collect()
      .sortBy(e => (e.ts_us, e.event_id))
      .map(e => (e.user_id, e.ts_us, e.event_id, e.event_type))
    val thirds = rows.grouped(math.max(rows.length / 3, 1)).toSeq
    val out = TransitionStream.userTransitions(
      streamDf.as[TransitionStream.TransEvent])
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("s11_out").start()
    thirds.foreach { part =>
      mem.addData(part.toSeq)
      q.processAllAvailable()
    }
    q.stop()
    // last emission per (user, from, to) is the quiet-period state
    val sink = spark.table("s11_out")
      .withColumn("__seq", monotonically_increasing_id())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("from_type"), col("to_type"))
      .orderBy(col("__seq").desc)
    val finalUsers = sink.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__seq", "__rn")
    val got = TransitionStream.matrixFromUsers(finalUsers)
      .collect().map(_.toSeq).toSet
    assert(got === batch)
  }

  test("s11 late regressions are refused, never folded backward") {
    import graft.streaming.TransitionStream
    val mem = MemoryStream[(Long, Long, Long, String)](spark)
    val streamDf = mem.toDF()
      .toDF("user_id", "ts_us", "event_id", "event_type")
    val out = TransitionStream.userTransitions(
      streamDf.as[TransitionStream.TransEvent])
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("s11_late_out").start()
    mem.addData(Seq((7L, 1L, 1L, "a"), (7L, 3L, 3L, "b")))
    q.processAllAvailable()
    // t=2 arrives AFTER t=3 was folded: dropped, no a→c / c→b invented
    mem.addData(Seq((7L, 2L, 2L, "c")))
    q.processAllAvailable()
    q.stop()
    val sink = spark.table("s11_late_out")
      .select("from_type", "to_type", "n")
      .as[(String, String, Long)].collect().toSet
    assert(sink === Set(("a", "b", 1L)))
  }

  test("streaming attribution fold == batch window form under in-order splits (s12)") {
    import graft.streaming.AttributionStream
    val events = table(spark, sfDir, "events")
    val batch = AttributionStream.lastTouchAttribution(events)
      .collect().map(_.toSeq).toSet

    val mem = MemoryStream[(Long, Long, Long, String, Double)](spark)
    val streamDf = mem.toDF()
      .toDF("user_id", "ts_us", "event_id", "event_type", "value")
    val rows = AttributionStream.attrEvents(events).collect()
      .sortBy(e => (e.ts_us, e.event_id))
      .map(e => (e.user_id, e.ts_us, e.event_id, e.event_type, e.value))
    val thirds = rows.grouped(math.max(rows.length / 3, 1)).toSeq
    val out = AttributionStream.userAttributions(
      streamDf.as[AttributionStream.AttrEvent])
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("s12_out").start()
    thirds.foreach { part =>
      mem.addData(part.toSeq)
      q.processAllAvailable()
    }
    q.stop()
    val sink = spark.table("s12_out")
      .withColumn("__seq", monotonically_increasing_id())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("touch_type"))
      .orderBy(col("__seq").desc)
    val finalUsers = sink.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__seq", "__rn")
    val got = AttributionStream.reportFromUsers(finalUsers)
      .collect().map(_.toSeq).toSet
    assert(got === batch)
  }

  test("s12 late purchases are refused, never credited backward") {
    import graft.streaming.AttributionStream
    val mem = MemoryStream[(Long, Long, Long, String, Double)](spark)
    val streamDf = mem.toDF()
      .toDF("user_id", "ts_us", "event_id", "event_type", "value")
    val out = AttributionStream.userAttributions(
      streamDf.as[AttributionStream.AttrEvent])
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("s12_late_out").start()
    mem.addData(Seq((7L, 1L, 1L, "click", 0.0), (7L, 3L, 3L, "view", 0.0)))
    q.processAllAvailable()
    // a purchase at t=2 arrives AFTER t=3 folded: refused, not credited
    // to the click (and no view credit invented either)
    mem.addData(Seq((7L, 2L, 2L, "purchase", 9.5)))
    q.processAllAvailable()
    // an in-order purchase then credits the view
    mem.addData(Seq((7L, 4L, 4L, "purchase", 2.25)))
    q.processAllAvailable()
    q.stop()
    val sink = spark.table("s12_late_out")
      .select("touch_type", "n", "value_micros")
      .as[(String, Long, Long)].collect().toSet
    assert(sink === Set(("view", 1L, 2250000L)))
  }

  test("streaming gap fold == batch lag histogram under in-order splits (s13)") {
    import graft.streaming.GapStream
    val events = table(spark, sfDir, "events")
    val batch = GapStream.gapHistogram(events)
      .collect().map(_.toSeq).toSet

    val mem = MemoryStream[(Long, Long, Long)](spark)
    val streamDf = mem.toDF().toDF("user_id", "ts_us", "event_id")
    val rows = GapStream.gapEvents(events).collect()
      .sortBy(e => (e.ts_us, e.event_id))
      .map(e => (e.user_id, e.ts_us, e.event_id))
    val thirds = rows.grouped(math.max(rows.length / 3, 1)).toSeq
    val out = GapStream.userGaps(streamDf.as[GapStream.GapEvent])
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("s13_out").start()
    thirds.foreach { part =>
      mem.addData(part.toSeq)
      q.processAllAvailable()
    }
    q.stop()
    val sink = spark.table("s13_out")
      .withColumn("__seq", monotonically_increasing_id())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("gap_bucket"))
      .orderBy(col("__seq").desc)
    val finalUsers = sink.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__seq", "__rn")
    val got = GapStream.histogramFromUsers(finalUsers)
      .collect().map(_.toSeq).toSet
    assert(got === batch)
  }

  test("streaming burst fold == batch RANGE-window max under in-order splits (s14)") {
    import graft.streaming.BurstStream
    val events = table(spark, sfDir, "events")
    val batch = BurstStream.burstBatch(events)
      .select("user_id", "max_burst")
      .as[(Long, Long)].collect().toSet

    val mem = MemoryStream[(Long, Long, Long)](spark)
    val streamDf = mem.toDF().toDF("user_id", "ts_us", "event_id")
    val rows = BurstStream.burstEvents(events).collect()
      .sortBy(e => (e.ts_us, e.event_id))
      .map(e => (e.user_id, e.ts_us, e.event_id))
    val thirds = rows.grouped(math.max(rows.length / 3, 1)).toSeq
    val out = BurstStream.userBursts(streamDf.as[BurstStream.BurstEvent])
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("s14_out").start()
    thirds.foreach { part =>
      mem.addData(part.toSeq)
      q.processAllAvailable()
    }
    q.stop()
    // latest emission per user is the final state
    val sink = spark.table("s14_out")
      .withColumn("__seq", monotonically_increasing_id())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("__seq").desc)
    val got = sink.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select("user_id", "max_burst")
      .as[(Long, Long)].collect().toSet
    assert(got === batch)
  }

  test("s14 trailing window slides and late regressions are refused") {
    import graft.streaming.BurstStream
    val mem = MemoryStream[(Long, Long, Long)](spark)
    val streamDf = mem.toDF().toDF("user_id", "ts_us", "event_id")
    val out = BurstStream.userBursts(
      streamDf.as[BurstStream.BurstEvent], windowSeconds = 60L)
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("s14_late_out").start()
    // three events inside one minute → burst 3; a fourth 61s after the
    // first has slid past it → window holds 3 again, max stays 3
    mem.addData(Seq((7L, 0L, 1L), (7L, 30000000L, 2L),
      (7L, 59000000L, 3L), (7L, 61000000L, 4L)))
    q.processAllAvailable()
    // a regression to t=5s is refused — it cannot reopen the closed
    // seconds and inflate the window to 4
    mem.addData(Seq((7L, 5000000L, 5L)))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("s14_late_out")
      .withColumn("__seq", monotonically_increasing_id())
      .orderBy(col("__seq").desc).select("max_burst")
      .as[Long].head()
    assert(last === 3L)
  }

  test("s13 late regressions are refused; equal-second gaps land bucket 0") {
    import graft.streaming.GapStream
    val mem = MemoryStream[(Long, Long, Long)](spark)
    val streamDf = mem.toDF().toDF("user_id", "ts_us", "event_id")
    val out = GapStream.userGaps(streamDf.as[GapStream.GapEvent])
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("s13_late_out").start()
    // 5s gap → bucket 2; same-second follow-up → bucket 0
    mem.addData(Seq((7L, 1000000L, 1L), (7L, 6000000L, 2L),
      (7L, 6400000L, 3L)))
    q.processAllAvailable()
    // t=2s arrives AFTER t=6.4s folded: dropped, no negative-gap bucket
    mem.addData(Seq((7L, 2000000L, 4L)))
    q.processAllAvailable()
    q.stop()
    val sink = spark.table("s13_late_out")
      .select("gap_bucket", "n")
      .as[(Int, Long)].collect().toSet
    assert(sink === Set((2, 1L), (0, 1L)))
  }

  test("streaming hourly uniques (chained dedup→agg) == batch distinct count (s15)") {
    val events = table(spark, sfDir, "events")
    val batch = EventStream.hourlyUniques(events)
      .collect().map(_.toSeq).toSet

    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    val streamDf = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val rows = events
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[(Long, Timestamp, Long, String, Double)].collect()
    // two batches: dedup state must bridge the micro-batch boundary
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val agg = EventStream.hourlyUniquesStream(streamDf)
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("s15_out").start()
    mem.addData(b1.toSeq)
    q.processAllAvailable()
    mem.addData(b2.toSeq)
    q.processAllAvailable()
    // sentinel far past the data's max ts → watermark closes every hour
    val maxTs = rows.map(_._2.getTime).max
    mem.addData(Seq((0L, new Timestamp(maxTs + 48L * 3600 * 1000),
      -1L, "click", 0.0)))
    q.processAllAvailable()
    mem.addData(Seq((0L, new Timestamp(maxTs + 96L * 3600 * 1000),
      -1L, "click", 0.0)))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("s15_out").collect().map(_.toSeq)
      .filterNot(_.head.asInstanceOf[Timestamp].getTime > maxTs)
      .toSet
    assert(streamed === batch)
  }

  test("streaming native session windows == batch session windows (s16)") {
    val events = table(spark, sfDir, "events")
    val batch = EventStream.sessionWindows(events, gapMinutes = 30)
      .collect().map(_.toSeq).toSet

    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    val streamDf = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val rows = events
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[(Long, Timestamp, Long, String, Double)].collect()
    // two batches split mid-stream: open sessions must merge across the
    // micro-batch boundary in the state store
    val (b1, b2) = rows.sortBy(_._2.getTime).splitAt(rows.length / 2)
    val agg = EventStream.sessionWindowsStream(streamDf, gapMinutes = 30)
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("s16_out").start()
    mem.addData(b1.toSeq)
    q.processAllAvailable()
    mem.addData(b2.toSeq)
    q.processAllAvailable()
    val maxTs = rows.map(_._2.getTime).max
    mem.addData(Seq((0L, new Timestamp(maxTs + 48L * 3600 * 1000),
      -1L, "click", 0.0)))
    q.processAllAvailable()
    mem.addData(Seq((0L, new Timestamp(maxTs + 96L * 3600 * 1000),
      -1L, "click", 0.0)))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("s16_out").collect().map(_.toSeq)
      .filterNot(r => r(0).asInstanceOf[Long] == -1L)
      .toSet
    assert(streamed === batch)
  }

  test("s15 dedup state: same user re-seen within the hour counts once across batches") {
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    def t(min: Int) = new Timestamp(3600L * 1000 * 24 + min * 60000L)
    val streamDf = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val agg = EventStream.hourlyUniquesStream(streamDf)
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("s15_state_out").start()
    mem.addData(Seq((1L, t(5), 7L, "view", 1.0),
      (2L, t(10), 8L, "view", 1.0)))
    q.processAllAvailable()
    // user 7 again in the SAME hour, later batch → must not recount
    mem.addData(Seq((3L, t(20), 7L, "click", 1.0)))
    q.processAllAvailable()
    mem.addData(Seq((4L, t(60 * 10), 9L, "view", 1.0)))
    q.processAllAvailable()
    mem.addData(Seq((5L, t(60 * 20), 9L, "view", 1.0)))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("s15_state_out")
      .select("hour", "n_users").as[(Timestamp, Long)].collect().toMap
    assert(out(t(0)) === 2L)
  }

  implicit class Tup3Ops[A, B, C](arr: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = arr.map(t => t._1 -> ((t._2, t._3))).toMap
  }
}
