package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Hits, KCore, ShortestPaths}

/** r13's broadcast-regime gates: below `broadcastMaxVertices` the
  * per-round joins broadcast the node-bounded side (score/frontier/
  * doomed/label table) so the checkpointed edge table is never re-sorted
  * or re-exchanged; above the gate they fall back to the co-partitioned
  * shuffle join. The gate is a PHYSICAL decision only — both regimes
  * must produce byte-equal results (the PageRankSpec regime discipline,
  * extended to the ops that gained the gate this round).
  */
class RegimeGateSpec extends SparkSessionSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private val edges: Seq[(Long, Long)] =
    (1 to 400).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(p => p._1 != p._2).distinct

  test("Hits: broadcast and co-partitioned regimes are byte-equal") {
    val e = edges.map { case (a, b) => (a, 100L + b) }.toDF("hub", "auth")
    val bc = Hits.fixedPointHits(e, 3)
      .as[(Long, Long, Boolean)].collect().toSet
    val co = Hits.fixedPointHits(e, 3, broadcastMaxVertices = 0L)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(bc === co)
  }

  test("bfsLevels: broadcast and co-partitioned regimes are byte-equal") {
    val e = edges.toDF("src", "dst")
    val src = Seq(1L, 2L).toDF("node")
    val bc = ShortestPaths.bfsLevels(e, src, maxDepth = 3)
      .as[(Long, Int)].collect().toSet
    val co = ShortestPaths.bfsLevels(e, src, maxDepth = 3,
        broadcastMaxVertices = 0L)
      .as[(Long, Int)].collect().toSet
    assert(bc === co)
  }

  test("bellmanFord: broadcast and co-partitioned regimes are byte-equal") {
    val e = edges.map { case (a, b) => (a, b, 1L + (a + b) % 7) }
      .toDF("src", "dst", "len")
    val src = Seq(1L, 2L).toDF("node")
    val bc = ShortestPaths.bellmanFord(e, src, rounds = 3)
      .as[(Long, Long)].collect().toSet
    val co = ShortestPaths.bellmanFord(e, src, rounds = 3,
        broadcastMaxVertices = 0L)
      .as[(Long, Long)].collect().toSet
    assert(bc === co)
  }

  test("kCore: broadcast and co-partitioned regimes are byte-equal") {
    val both = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val e = both.toDF("src", "dst")
    val bc = KCore.kCore(e, k = 4)
      .as[(Long, Long)].collect().toSet
    val co = KCore.kCore(e, k = 4, broadcastMaxVertices = 0L)
      .as[(Long, Long)].collect().toSet
    assert(bc === co)
  }

  test("components: broadcast and co-partitioned regimes are byte-equal") {
    // a long chain exercises the pointer-jump rounds in both regimes
    val chain = (0L until 40L).map(i => (i, i + 1))
    val pairs = chain.toDF("id_a", "id_b")
    val bc = Dedup.components(pairs)
      .as[(Long, Long)].collect().toSet
    val co = Dedup.components(pairs, broadcastMaxVertices = 0L)
      .as[(Long, Long)].collect().toSet
    assert(bc === co)
  }
}
