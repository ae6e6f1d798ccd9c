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
    * second implementation, not a re-run of the Spark plan.
    */
  private def replay(
      edges: Seq[(Long, Long)], iterations: Int): Map[Long, Long] = {
    val e = edges.distinct
    val outdeg = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var r = e.map(_._1).distinct.map(_ -> Scale).toMap
    for (_ <- 1 to iterations) {
      val contribs = e.groupBy(_._2).map { case (dst, in) =>
        dst -> in.map { case (src, _) => r(src) / outdeg(src) }.sum
      }
      r = contribs.map { case (v, s) =>
        v -> (Scale / 100L * 15L + 85L * s / 100L)
      }
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
    val e = edges.distinct()
    val withDeg = e.join(
      e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
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

  test("iteration and scale bounds are enforced") {
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      PageRank.fixedPointPageRank(e, iterations = 0)
    }
    intercept[IllegalArgumentException] {
      PageRank.fixedPointPageRank(e, iterations = 5, scale = 1010L)
    }
  }
}
