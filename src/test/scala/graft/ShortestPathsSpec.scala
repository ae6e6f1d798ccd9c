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
}
