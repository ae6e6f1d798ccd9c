package graft

import org.apache.spark.sql.functions._

import graft.ops.LinkPrediction

class LinkPredictionSpec extends SparkSessionSpec {
  import spark.implicits._

  // K4 minus the (1,4) edge: 1-2, 1-3, 2-3, 2-4, 3-4.
  // Non-edge (1,4): common neighbors {2, 3}; deg(1)=2, deg(4)=2,
  // deg(2)=deg(3)=3 → jaccard = 2/(2+2-2) = 1.0,
  // AA = 2·round(1/ln 3, 6) = 2·0.910239 = 1.820478.
  private def edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    .toDF("lo", "hi")

  test("hand graph: CN, Jaccard, Adamic–Adar exact on the missing K4 edge") {
    val got = LinkPrediction
      .neighborScores(edges, maxFanout = 32, minCommon = 1)
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(got.length === 1) // (1,4) is the only non-edge with a wedge
    val (a, b, cn, jac, aa) = got.head
    assert((a, b) === (1L, 4L))
    assert(cn === 2L)
    assert(jac === 1.0)
    assert(aa === 1.820478)
  }

  test("existing edges never appear; minCommon gates") {
    val all = LinkPrediction
      .neighborScores(edges, maxFanout = 32, minCommon = 1)
      .select(col("part_a"), col("part_b")).as[(Long, Long)].collect().toSet
    val e = Set((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(all.intersect(e).isEmpty)
    val gated = LinkPrediction
      .neighborScores(edges, maxFanout = 32, minCommon = 3)
      .count()
    assert(gated === 0L)
  }

  test("adjacency truncation is deterministic: fanout keeps the min-id neighbors per pivot") {
    // star around 10: neighbors 1,2,3,4. fanout=2 keeps only {1,2} in
    // pivot 10's list → exactly the (1,2) pair is scored; (x,3)/(x,4)
    // pairs never materialize a wedge.
    val star = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L))
      .toDF("lo", "hi")
    val got = LinkPrediction
      .neighborScores(star, maxFanout = 2, minCommon = 1)
      .select(col("part_a"), col("part_b")).as[(Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 2L)))
  }

  test("scores are partitioning-invariant") {
    val a = LinkPrediction.neighborScores(edges, 32, 1)
      .collect().map(_.toSeq).toSet
    val b = LinkPrediction.neighborScores(edges.repartition(7), 32, 1)
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }
}
