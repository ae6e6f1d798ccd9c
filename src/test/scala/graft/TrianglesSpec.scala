package graft

import org.apache.spark.sql.functions._

import graft.ops.Triangles

class TrianglesSpec extends SparkSessionSpec {
  import spark.implicits._

  private def count(edges: Seq[(Long, Long)]): Long =
    Triangles.triangleCount(edges.toDF("src", "dst"))
      .as[Long].head()

  test("triangle count on hand-built graphs") {
    // K3: one triangle
    assert(count(Seq((1L, 2L), (2L, 3L), (1L, 3L))) === 1L)
    // K4: four triangles
    assert(count(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))) === 4L)
    // path: none
    assert(count(Seq((1L, 2L), (2L, 3L), (3L, 4L))) === 0L)
    // star: none (no closing edges)
    assert(count(Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))) === 0L)
    // bowtie: two triangles sharing node 3
    assert(count(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (3L, 5L))) === 2L)
  }

  test("normalization: orientation, duplicates, self-loops don't change the count") {
    val messy = Seq(
      (2L, 1L), (1L, 2L), // both orientations + dup
      (2L, 3L), (3L, 1L),
      (1L, 1L), (3L, 3L)) // self-loops
    assert(count(messy) === 1L)
  }

  test("property: random graphs match a local naive count (seeded)") {
    val rnd = new scala.util.Random(1234)
    for (_ <- 1 to 8) {
      val n = 5 + rnd.nextInt(25)
      val density = 0.1 + rnd.nextDouble() * 0.4
      val es = for {
        a <- 0 until n; b <- a + 1 until n if rnd.nextDouble() < density
      } yield (a.toLong, b.toLong)
      // scramble orientations, re-inject duplicates and a self-loop
      val messy = es.map { case (a, b) =>
        if (rnd.nextBoolean()) (b, a) else (a, b)
      } ++ es.take(es.size / 3) ++ Seq((0L, 0L))
      val adj = es.toSet
      var naive = 0L
      for {
        a <- 0 until n; b <- a + 1 until n if adj((a.toLong, b.toLong))
        c <- b + 1 until n
        if adj((b.toLong, c.toLong)) && adj((a.toLong, c.toLong))
      } naive += 1
      assert(count(messy) === naive, s"graph n=$n |E|=${es.size}")
    }
  }

  test("vertexTriangles: per-vertex credits on hand-built graphs") {
    def vt(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Long)] =
      Triangles.vertexTriangles(edges.toDF("src", "dst"))
        .as[(Long, Long, Long, Long)].collect()
        .map { case (v, d, t, w) => v -> (d, t, w) }.toMap

    // triangle 1-2-3 with a pendant edge 3-4
    val bow = vt(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
    assert(bow(1L) === ((2L, 1L, 1L)))
    assert(bow(2L) === ((2L, 1L, 1L)))
    assert(bow(3L) === ((3L, 1L, 3L)))
    assert(bow(4L) === ((1L, 0L, 0L))) // degree-1: no wedge, no triangle

    // K4: every vertex in C(3,2)=3 triangles, wedges C(3,2)=3
    val k4 = vt(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)))
    assert(k4.values.toSet === Set((3L, 3L, 3L)))

    // star: hub has wedges but zero triangles
    val star = vt(Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)))
    assert(star(1L) === ((4L, 0L, 6L)))
    assert(star(2L) === ((1L, 0L, 0L)))
  }

  test("vertexTriangles credits sum to 3x the triangle count on real edges") {
    val lp = Engine.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val edges = lp.as("x").join(lp.as("y"), "l_orderkey")
      .filter(col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
    val total = Triangles.triangleCount(edges).as[Long].head()
    val perVertex = Triangles.vertexTriangles(edges)
    assert(perVertex.agg(sum(col("triangles"))).as[Long].head() === 3 * total)
    // wedge bound: no vertex participates in more triangles than wedges
    assert(perVertex.filter(col("triangles") > col("wedges")).count() === 0L)
  }

  test("degree-ordered count == naive ordered-triple count on real edges") {
    val lp = Engine.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val edges = lp.as("x").join(lp.as("y"), "l_orderkey")
      .filter(col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
    val got = Triangles.triangleCount(edges).as[Long].head()

    val e = edges.select(least(col("src"), col("dst")).as("lo"),
      greatest(col("src"), col("dst")).as("hi")).distinct()
    val naive = e.as("e1")
      .join(e.as("e2"), col("e2.lo") === col("e1.hi"))
      .join(e.as("e3"),
        col("e3.lo") === col("e1.lo") && col("e3.hi") === col("e2.hi"))
      .count()
    assert(got === naive)
    info(s"triangles in sf0.001 co-ordered-parts graph: $got")
  }
}
