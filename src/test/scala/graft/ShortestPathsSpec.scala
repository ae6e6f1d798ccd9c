package graft

import org.apache.spark.sql.functions._

import graft.ops.ShortestPaths

class ShortestPathsSpec extends SparkSessionSpec {
  import spark.implicits._

  private def levels(
      edges: Seq[(Long, Long)], sources: Seq[Long],
      maxDepth: Int): Map[Long, Int] =
    ShortestPaths.bfsLevels(
      edges.toDF("src", "dst"), sources.toDF("node"), maxDepth)
      .as[(Long, Int)].collect().toMap

  // both orientations — the graph queries feed undirected graphs this way
  private def undirected(e: Seq[(Long, Long)]): Seq[(Long, Long)] =
    e ++ e.map { case (a, b) => (b, a) }

  test("path graph: levels are hop distances, depth cap truncates") {
    val path = undirected(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(levels(path, Seq(1L), 10) ===
      Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4))
    assert(levels(path, Seq(1L), 2) === Map(1L -> 0, 2L -> 1, 3L -> 2))
    assert(levels(path, Seq(1L), 0) === Map(1L -> 0))
  }

  test("multi-source: level is the distance to the NEAREST source") {
    val path = undirected(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(levels(path, Seq(1L, 5L), 10) ===
      Map(1L -> 0, 5L -> 0, 2L -> 1, 4L -> 1, 3L -> 2))
  }

  test("cycle: BFS terminates and takes the short way around") {
    val cyc = undirected(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L)))
    assert(levels(cyc, Seq(1L), 10) ===
      Map(1L -> 0, 2L -> 1, 5L -> 1, 3L -> 2, 4L -> 2))
  }

  test("disconnected component is absent; directed edges are honored") {
    val g = Seq((1L, 2L), (2L, 3L), (10L, 11L)) // directed only
    assert(levels(g, Seq(1L), 5) === Map(1L -> 0, 2L -> 1, 3L -> 2))
    // 3 -> 2 has no directed edge back
    assert(levels(g, Seq(3L), 5) === Map(3L -> 0))
  }

  test("property: random graphs match a local Dijkstra-free BFS (seeded)") {
    val rnd = new scala.util.Random(4242)
    for (_ <- 1 to 6) {
      val n = 6 + rnd.nextInt(20)
      val edges = (1 to n * 2).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val sources = Seq(0L, (n / 2).toLong).distinct
      val depth = 4
      // local reference BFS
      val adj = edges.groupBy(_._1).map { case (k, v) => (k, v.map(_._2)) }
      var expect = sources.map(_ -> 0).toMap
      var frontier = sources.toSet
      for (d <- 1 to depth) {
        val next = frontier.flatMap(v => adj.getOrElse(v, Seq()))
          .diff(expect.keySet)
        expect = expect ++ next.map(_ -> d)
        frontier = next
      }
      assert(levels(edges, sources, depth) === expect)
    }
  }

  private def dists(
      edges: Seq[(Long, Long, Long)], sources: Seq[Long],
      rounds: Int): Map[Long, Long] =
    ShortestPaths.bellmanFord(
      edges.toDF("src", "dst", "len"), sources.toDF("node"), rounds)
      .as[(Long, Long)].collect().toMap

  test("bellmanFord: weighted path — cheap detour beats the direct hop") {
    // 1→3 direct costs 10; 1→2→3 costs 2+3=5. One round only sees the
    // direct edge; two rounds find the detour.
    val g = Seq((1L, 3L, 10L), (1L, 2L, 2L), (2L, 3L, 3L))
    assert(dists(g, Seq(1L), 1) === Map(1L -> 0L, 2L -> 2L, 3L -> 10L))
    assert(dists(g, Seq(1L), 2) === Map(1L -> 0L, 2L -> 2L, 3L -> 5L))
  }

  test("bellmanFord: parallel edges collapse to the minimum length") {
    val g = Seq((1L, 2L, 7L), (1L, 2L, 4L), (1L, 2L, 9L))
    assert(dists(g, Seq(1L), 1) === Map(1L -> 0L, 2L -> 4L))
  }

  test("bellmanFord: multi-source takes the nearest source; unreached absent") {
    val g = Seq((1L, 2L, 5L), (9L, 2L, 1L), (2L, 3L, 1L), (50L, 51L, 1L))
    assert(dists(g, Seq(1L, 9L), 3) ===
      Map(1L -> 0L, 9L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("bellmanFord: property — random weighted graphs match local Bellman–Ford") {
    val rnd = new scala.util.Random(777)
    for (_ <- 1 to 5) {
      val n = 5 + rnd.nextInt(12)
      val edges = (1 to n * 3).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong,
          1L + rnd.nextInt(20)))
        .filter { case (a, b, _) => a != b }
      val sources = Seq(0L)
      val rounds = 4
      // local reference: rounds relaxations over min-collapsed edges
      val minE = edges.groupBy(e => (e._1, e._2))
        .map { case (k, v) => (k._1, k._2, v.map(_._3).min) }
      var expect: Map[Long, Long] = sources.map(_ -> 0L).toMap
      for (_ <- 1 to rounds) {
        val relaxed = minE.flatMap { case (s, d, w) =>
          expect.get(s).map(ds => d -> (ds + w)) }
        expect = (expect.toSeq ++ relaxed).groupBy(_._1)
          .map { case (k, v) => (k, v.map(_._2).min) }
      }
      assert(dists(edges, sources, rounds) === expect)
    }
  }

  test("bellmanFord: non-positive edge lengths are refused") {
    intercept[IllegalArgumentException] {
      dists(Seq((1L, 2L, 0L)), Seq(1L), 1)
    }
    intercept[IllegalArgumentException] {
      dists(Seq((1L, 2L, 3L)), Seq(1L), 0)
    }
  }

  test("per-round join exchanges only the frontier — edges read from the checkpointed layout") {
    import org.apache.spark.sql.functions._
    // the round shape bfsLevels builds: a source-keyed checkpointed edge
    // table joined by a small frontier. The edge side must satisfy the
    // join's distribution from its materialized layout — exactly one
    // hash exchange (the frontier's) in the final plan.
    val e = (1L to 400L).map(i => (i % 50, (i * 7) % 50))
      .toDF("__src", "__dst")
      .filter(col("__src") =!= col("__dst")).distinct()
      .repartition(col("__src")).localCheckpoint()
    val frontier = Seq(1L, 2L, 3L).toDF("node")
    val joined = frontier.join(e, col("node") === col("__src"))
      .select(col("__dst").as("node")).distinct()
    joined.collect()
    val p = joined.queryExecution.executedPlan.toString
    val finalSection = p.split("== Initial Plan ==").head
    val exchanges = finalSection.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))
    // one exchange for the frontier side of the join, one for the
    // distinct's own aggregate — the EDGE side contributes none
    assert(exchanges <= 2, s"edge side re-shuffles: $exchanges exchanges\n$p")
    assert(!finalSection.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning(__src")),
      "edge table re-exchanged on __src despite checkpointed layout")
  }
}
