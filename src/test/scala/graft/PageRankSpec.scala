package graft

import org.apache.spark.sql.functions._

import graft.ops.PageRank

/** Fixed-point PageRank: differential against an independent driver-side
  * replay of the integer recurrence (exact equality — the operator's
  * whole point is bit-reproducibility), plus closed-form and
  * partition-invariance cases.
  */
class PageRankSpec extends SparkSessionSpec {
  import spark.implicits._

  private val Scale = 1000000000000L

  /** Driver-side replay: the same recurrence over a Map — an independent
    * second implementation, not a re-run of the Spark plan. General form:
    * vertices = src ∪ dst, dangling mass redistributed as D div N, all
    * arithmetic positive-long truncating division (== div on both
    * engines).
    */
  private def replay(
      edges: Seq[(Long, Long)], iterations: Int): Map[Long, Long] = {
    val e = edges.distinct
    val outdeg = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val vertices = (e.map(_._1) ++ e.map(_._2)).distinct
    val n = vertices.size.toLong
    var r = vertices.map(_ -> Scale).toMap
    for (_ <- 1 to iterations) {
      val contribs = e.groupBy(_._2).map { case (dst, in) =>
        dst -> in.map { case (src, _) => r(src) / outdeg(src) }.sum
      }
      val dmass = vertices.filterNot(outdeg.contains).map(r).sum
      r = vertices.map { v =>
        v -> (Scale / 100L * 15L +
          85L * (contribs.getOrElse(v, 0L) + dmass / n) / 100L)
      }.toMap
    }
    r
  }

  test("two-node cycle is the exact fixed point: ranks stay at scale") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = PageRank.fixedPointPageRank(edges, iterations = 7)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> Scale, 2L -> Scale))
  }

  test("random bidirectional graph == independent integer replay, bit for bit") {
    val rnd = new scala.util.Random(7)
    val oneWay = Seq.fill(300)((rnd.nextInt(40).toLong, 40L + rnd.nextInt(40)))
    val both = (oneWay ++ oneWay.map(_.swap)).distinct
    val want = replay(both, 5)
    val got = PageRank.fixedPointPageRank(both.toDF("src", "dst"), 5)
      .as[(Long, Long)].collect().toMap
    assert(got === want)
    // hub concentration: the star center of the densest vertex outranks
    // the uniform start (sanity that mass actually flowed)
    assert(got.values.max > Scale)
  }

  test("dangling vertices: mass redistributes, no-in-edge vertices keep base+share") {
    // 3 is dangling (no out-edges); 4 has out-edges but no in-edges —
    // both contract gaps the src∧dst precondition used to exclude
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (4L, 1L), (4L, 3L))
    val got = PageRank.fixedPointPageRank(edges.toDF("src", "dst"), 6)
      .as[(Long, Long)].collect().toMap
    val want = replay(edges, 6)
    assert(got === want)
    assert(got.keySet === Set(1L, 2L, 3L, 4L), "full src ∪ dst universe")
    // dangling redistribution is live: 3 hoards mass it never emits via
    // edges, yet everyone still receives its share (r > pure base)
    val base = Scale / 100L * 15L
    assert(got(4L) > base, "no-in-edge vertex must still get the dangling share")
  }

  test("dangling path == replay across partitionings and the broadcast gate") {
    val rnd = new scala.util.Random(3)
    // skewed one-way graph: many dangling sinks, several source-only hubs
    val edges = (Seq.fill(400)((rnd.nextInt(30).toLong, 30L + rnd.nextInt(60))) ++
      Seq((100L, 5L), (101L, 5L))).distinct
    val want = replay(edges, 5)
    for (parts <- Seq(1, 8); gate <- Seq(2000000L, 0L)) {
      val got = PageRank.fixedPointPageRank(
        edges.toDF("src", "dst").repartition(parts), 5,
        broadcastMaxVertices = gate)
        .as[(Long, Long)].collect().toMap
      assert(got === want, s"parts=$parts gate=$gate")
    }
  }

  test("result is partition-invariant (1 vs 8 input partitions)") {
    val edges = (1L to 50L).flatMap(i =>
      Seq((i, i % 50 + 1), (i % 50 + 1, i)))
    val a = PageRank.fixedPointPageRank(
      edges.toDF("src", "dst").repartition(1), 4)
      .as[(Long, Long)].collect().toMap
    val b = PageRank.fixedPointPageRank(
      edges.toDF("src", "dst").repartition(8), 4)
      .as[(Long, Long)].collect().toMap
    assert(a === b)
  }

  test("above the broadcast gate: same bits, no broadcast join") {
    val rnd = new scala.util.Random(11)
    val oneWay = Seq.fill(200)((rnd.nextInt(30).toLong, 30L + rnd.nextInt(30)))
    val both = (oneWay ++ oneWay.map(_.swap)).distinct
    val edges = both.toDF("src", "dst")
    val small = PageRank.fixedPointPageRank(edges, 4)
      .as[(Long, Long)].collect().toMap
    // gate forced: every graph is "too big to broadcast"
    val big = PageRank.fixedPointPageRank(edges, 4, broadcastMaxVertices = 0L)
      .as[(Long, Long)].collect().toMap
    assert(big === small, "gated path must be bit-identical to broadcast path")
    assert(big === replay(both, 4))
  }

  test("gated round plans a non-broadcast join; broadcast round broadcasts") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val e = edges.distinct().withColumn("w", lit(1L))
    val withDeg = e.join(
      e.groupBy("src").agg(sum(col("w")).as("wsum")), "src")
    val ranks = withDeg.select(col("src").as("vertex"))
      .distinct().withColumn("r", lit(1000000000000L))
    def plan(useBroadcast: Boolean): String = {
      val df = PageRank.round(withDeg, ranks, 150000000000L, useBroadcast)
      df.queryExecution.toRdd.count() // finalize AQE decisions
      df.queryExecution.executedPlan.toString()
    }
    // At test scale AQE would broadcast the tiny rank side regardless of
    // the hint; zero both thresholds to emulate a rank table that exceeds
    // any broadcast budget — the regime the gate exists for.
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(spark.conf.set(_, "-1"))
    try assert(!plan(useBroadcast = false).contains("BroadcastHashJoin"),
      "gated path must not plan a broadcast join")
    finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
    assert(plan(useBroadcast = true).contains("BroadcastHashJoin"))
  }

  test("gated regime on a multi-partition edge set: no broadcast join, bit-exact") {
    // the SMJ regime driven end-to-end over real multi-partition data —
    // not just plan-asserted on a toy frame: the round must both avoid
    // BroadcastHashJoin and reproduce the replay bit for bit
    val rnd = new scala.util.Random(19)
    val oneWay = Seq.fill(250)((rnd.nextInt(40).toLong, 40L + rnd.nextInt(40)))
    val both = (oneWay ++ oneWay.map(_.swap)).distinct
    val e = both.toDF("src", "dst").repartition(8).distinct()
      .withColumn("w", lit(1L))
    val withDeg = e.join(
      e.groupBy("src").agg(sum(col("w")).as("wsum")), "src")
      .repartition(col("src")).localCheckpoint()
    val ranks = withDeg.select(col("src").as("vertex")).distinct()
      .withColumn("r", lit(Scale)).localCheckpoint()
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(spark.conf.set(_, "-1"))
    try {
      val df = PageRank.round(
        withDeg, ranks, Scale / 100L * 15L, useBroadcast = false)
      val got = df.as[(Long, Long)].collect().toMap
      assert(!df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        "gated regime must not broadcast")
      assert(got === replay(both, 1))
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("iteration and scale bounds are enforced") {
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      PageRank.fixedPointPageRank(e, iterations = 0)
    }
    intercept[IllegalArgumentException] {
      PageRank.fixedPointPageRank(e, iterations = 5, scale = 1010L)
    }
  }

  /** Independent replay of the PERSONALIZED recurrence: base
    * (15·scale·N) div (100·|S|) on S, zero elsewhere.
    */
  private def replayPpr(
      edges: Seq[(Long, Long)], seeds: Set[Long],
      iterations: Int): Map[Long, Long] = {
    val e = edges.distinct
    val outdeg = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val vertices = (e.map(_._1) ++ e.map(_._2)).distinct
    val n = vertices.size.toLong
    val s = seeds.intersect(vertices.toSet)
    val baseS = Scale / 100L * 15L * n / s.size
    var r = vertices.map(_ -> Scale).toMap
    for (_ <- 1 to iterations) {
      val contribs = e.groupBy(_._2).map { case (dst, in) =>
        dst -> in.map { case (src, _) => r(src) / outdeg(src) }.sum
      }
      r = vertices.map { v =>
        v -> ((if (s(v)) baseS else 0L) +
          85L * contribs.getOrElse(v, 0L) / 100L)
      }.toMap
    }
    r
  }

  test("personalized PageRank == independent replay; mass concentrates at seeds") {
    val rnd = new scala.util.Random(11)
    val oneWay = Seq.fill(300)((rnd.nextInt(40).toLong, 40L + rnd.nextInt(40)))
    val both = (oneWay ++ oneWay.map(_.swap)).distinct
    val seeds = Set(41L, 43L, 47L)
    val want = replayPpr(both, seeds, 5)
    val got = PageRank.personalizedPageRank(
      both.toDF("src", "dst"), seeds.toSeq.toDF("vertex"), 5)
      .as[(Long, Long)].collect().toMap
    assert(got === want)
    // proximity property: the seed average outranks the global average
    val seedAvg = seeds.toSeq.map(got).sum / seeds.size
    val allAvg = got.values.sum / got.size
    assert(seedAvg > allAvg, s"seeds avg $seedAvg <= global avg $allAvg")
  }

  test("personalized PageRank enforces its contracts") {
    val dangling = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    intercept[IllegalArgumentException] { // 3 has no out-edges
      PageRank.personalizedPageRank(dangling, Seq(1L).toDF("vertex"), 2)
    }
    intercept[IllegalArgumentException] { // seeds outside the graph
      PageRank.personalizedPageRank(e, Seq(99L).toDF("vertex"), 2)
    }
  }
}
