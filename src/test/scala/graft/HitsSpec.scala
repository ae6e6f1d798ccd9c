package graft

import org.apache.spark.sql.functions._

import graft.ops.Hits

class HitsSpec extends SparkSessionSpec {
  import spark.implicits._

  private val Scale = 1000000L

  /** Local replay of the fixed-point recurrence — the oracle's unroll in
    * Scala: half-round sum, then (r·scale) / max (floor on positives).
    */
  private def localHits(
      edges: Seq[(Long, Long)], iterations: Int): Map[(Long, Boolean), Long] = {
    val e = edges.distinct
    var a: Map[Long, Long] = e.map(_._2).distinct.map(_ -> Scale).toMap
    var h: Map[Long, Long] = Map.empty
    for (_ <- 1 to iterations) {
      val hRaw = e.groupBy(_._1).view
        .mapValues(_.map(x => a(x._2)).sum).toMap
      val hm = hRaw.values.max
      h = hRaw.view.mapValues(r => r * Scale / hm).toMap
      val aRaw = e.groupBy(_._2).view
        .mapValues(_.map(x => h(x._1)).sum).toMap
      val am = aRaw.values.max
      a = aRaw.view.mapValues(r => r * Scale / am).toMap
    }
    a.map { case (v, s) => (v, false) -> s } ++
      h.map { case (v, s) => (v, true) -> s }
  }

  private def run(
      edges: Seq[(Long, Long)], iterations: Int): Map[(Long, Boolean), Long] =
    Hits.fixedPointHits(edges.toDF("hub", "auth"), iterations)
      .as[(Long, Long, Boolean)].collect()
      .map { case (v, s, hs) => (v, hs) -> s }.toMap

  test("star: the shared authority dominates, symmetric hubs stay equal") {
    // hubs 1,2,3 all point at auth 10; hub 1 also points at auth 11
    val e = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 11L))
    val out = run(e, 3)
    assert(out((10L, false)) === Scale) // max authority normalizes to scale
    assert(out((1L, true)) === Scale)   // hub 1 covers both auths
    assert(out((2L, true)) === out((3L, true)))
    assert(out((2L, true)) < out((1L, true)))
    assert(out((11L, false)) < out((10L, false)))
  }

  test("bit-exact vs the locally unrolled recurrence (random bipartite)") {
    val rnd = new scala.util.Random(4242)
    for (_ <- 1 to 3) {
      val e = (1 to 60).map(_ =>
        (rnd.nextInt(8).toLong, 100L + rnd.nextInt(10))).distinct
      assert(run(e, 4) === localHits(e, 4))
    }
  }

  test("duplicate edges collapse before the fold") {
    val e = Seq((1L, 10L), (1L, 10L), (2L, 10L))
    assert(run(e, 2) === run(e.distinct, 2))
  }

  test("iteration bounds are enforced") {
    intercept[IllegalArgumentException] {
      Hits.fixedPointHits(Seq((1L, 2L)).toDF("hub", "auth"), 0)
    }
  }
}
