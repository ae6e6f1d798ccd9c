package graft

import org.apache.spark.sql.functions._

import graft.ops.RandomWalks

class RandomWalksSpec extends SparkSessionSpec {
  import spark.implicits._

  // path graph 1—2—3—4 plus the 2—4 chord
  private def edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 4L))
    .toDF("lo", "hi")

  test("every consecutive walk step traverses a real edge") {
    val w = RandomWalks.walkCorpus(edges, steps = 4, walksPerVertex = 3)
    val steps = w.as[(Long, Int, Int, Long)].collect()
      .groupBy(t => (t._1, t._2)) // (start, wid)
      .values.map(_.sortBy(_._3).map(_._4).toSeq)
    val e = Set((1L, 2L), (2L, 3L), (3L, 4L), (2L, 4L))
      .flatMap { case (a, b) => Set((a, b), (b, a)) }
    steps.foreach { path =>
      assert(path.length === 5)
      path.sliding(2).foreach { p =>
        assert(e.contains((p(0), p(1))), s"non-edge hop in $path")
      }
    }
  }

  test("walk corpus shape: (V × walks) rows per step, step 0 is the start") {
    val w = RandomWalks.walkCorpus(edges, steps = 2, walksPerVertex = 2)
    val byStep = w.groupBy("step").count()
      .as[(Int, Long)].collect().toMap
    assert(byStep === Map(0 -> 8L, 1 -> 8L, 2 -> 8L))
    val s0 = w.filter(col("step") === 0)
      .select(col("start") === col("vertex")).as[Boolean].collect()
    assert(s0.forall(identity))
  }

  test("walks are a pure function of (edges, seed): partitioning-invariant, seed-sensitive") {
    val a = RandomWalks.walkCorpus(edges, steps = 3, walksPerVertex = 2,
      seed = 11L).collect().map(_.toSeq).toSet
    val b = RandomWalks.walkCorpus(edges.repartition(7), steps = 3,
      walksPerVertex = 2, seed = 11L).collect().map(_.toSeq).toSet
    assert(a === b)
    val c = RandomWalks.walkCorpus(edges, steps = 3, walksPerVertex = 2,
      seed = 12L).collect().map(_.toSeq).toSet
    assert(a !== c)
  }

  test("distinct walk ids from one start diverge somewhere on the chorded graph") {
    val w = RandomWalks.walkCorpus(edges, steps = 4, walksPerVertex = 3)
      .filter(col("start") === 2L)
      .as[(Long, Int, Int, Long)].collect()
      .groupBy(_._2).view.mapValues(_.sortBy(_._3).map(_._4).toSeq).toMap
    assert(w.size === 3)
    // degree-3 vertex 2: three LCG-keyed walks should not all coincide
    assert(w.values.toSet.size >= 2)
  }
}
