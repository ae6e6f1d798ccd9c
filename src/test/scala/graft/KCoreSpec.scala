package graft

import graft.ops.KCore

class KCoreSpec extends SparkSessionSpec {
  import spark.implicits._

  private def core(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] =
    KCore.kCore(edges.toDF("src", "dst"), k)
      .as[(Long, Long)].collect().toMap

  private def undirected(e: Seq[(Long, Long)]): Seq[(Long, Long)] =
    e ++ e.map { case (a, b) => (b, a) }

  // triangle {1,2,3} with a pendant path 3-4-5 hanging off it
  private val triPlusTail =
    undirected(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)))

  test("2-core peels the pendant path, keeps the triangle") {
    assert(core(triPlusTail, 2) === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("peeling cascades: removing the leaf dooms its parent next round") {
    // 1-core of a bare path keeps everything; 2-core unravels it from
    // both ends, one vertex per round — the multi-round cascade
    val path = undirected(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(core(path, 1).keySet === Set(1L, 2L, 3L, 4L, 5L))
    assert(core(path, 2) === Map.empty[Long, Long])
  }

  test("k above the max core number yields an empty core") {
    assert(core(triPlusTail, 3) === Map.empty[Long, Long])
  }

  test("core degrees are the WITHIN-core degrees, not the input degrees") {
    // K4 on {1,2,3,4} plus vertex 5 attached to 1 and 2: the 3-core is
    // the K4, and 1/2 report degree 3 (not their input degree 4)
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val g = undirected(k4 ++ Seq((5L, 1L), (5L, 2L)))
    assert(core(g, 3) === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("self-loops and duplicate edges are ignored") {
    val g = undirected(Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 2L))) ++
      Seq((1L, 1L), (2L, 2L))
    assert(core(g, 2) === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("decremental degrees match a full recompute at the fixpoint") {
    // two triangles bridged by an edge: the 2-core is everything; the
    // 3-core is empty. Bridge endpoints must report within-core degree.
    val g = undirected(Seq(
      (1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L),
      (3L, 4L)))
    val c2 = core(g, 2)
    assert(c2 === Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 3L, 5L -> 2L, 6L -> 2L))
    assert(core(g, 3) === Map.empty[Long, Long])
  }
}
