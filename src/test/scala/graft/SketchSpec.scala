package graft

import org.apache.spark.sql.functions._

import graft.Engine.table

/** Error bounds for the sketch aggregates (no SQL oracle — sketch
  * internals are engine-specific, so correctness is a bound vs the exact
  * aggregate, not a hash match).
  */
class SketchSpec extends SparkSessionSpec {
  import spark.implicits._

  test("HLL++ distinct verdict: exact matches countDistinct, bound holds") {
    val e = table(spark, sfDir, "events")
    val got = SparkEntry.queries("q18_sketch_distinct")(spark, sfDir)
      .as[(String, Long, Boolean)].collect()
    val exact = e.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got.map(_._1).toSet === exact.keySet)
    got.foreach { case (k, n, ok) =>
      assert(n === exact(k), s"$k exact_users")
      // the verdict IS the 3x-rsd bound — a false here means the HLL
      // estimate drifted past 6% of exact
      assert(ok, s"$k HLL estimate out of bounds (exact=$n)")
    }
  }

  test("quantile sketch verdict: exact discrete quantiles, rank bound holds") {
    val e = table(spark, sfDir, "events")
    val got = SparkEntry.queries("q19_sketch_quantiles")(spark, sfDir)
      .as[(String, Double, Double, Double, Boolean)].collect()
    assert(got.nonEmpty)
    // exact interpolated percentile BANDS bracket the discrete picks
    val bands = e.groupBy("event_type")
      .agg(expr("percentile(value, array(0.45, 0.55))").as("p50band"),
        expr("percentile(value, array(0.93, 0.97))").as("p95band"))
      .as[(String, Seq[Double], Seq[Double])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    got.foreach { case (k, q50, q95, q99, ok) =>
      assert(ok, s"$k sketch rank verdict false")
      assert(q50 <= q95 && q95 <= q99, s"$k quantiles not monotone")
      val (p50band, p95band) = bands(k)
      assert(q50 >= p50band.head && q50 <= p50band.last,
        s"$k q50 $q50 outside ${p50band}")
      assert(q95 >= p95band.head && q95 <= p95band.last,
        s"$k q95 $q95 outside ${p95band}")
    }
  }

  test("KMV distinct estimate tracks exact counts; degenerates to exact < k") {
    val e = table(spark, sfDir, "events")
    val exact = e.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    val est = graft.ops.Sketches.kmvDistinct(e, "user_id", "event_type", k = 64)
      .as[(String, Double, Long)].collect()
    assert(est.map(_._1).toSet === exact.keySet)
    est.foreach { case (tpe, v, nk) =>
      val n = exact(tpe)
      if (n < 64) {
        // fewer distinct keys than the summary: the sketch IS the truth
        assert(v === n.toDouble && nk === n)
      } else {
        // standard KMV error ~ 1/sqrt(k) = 12.5%; allow 4 sigma
        assert(nk === 64L)
        assert(math.abs(v - n) <= 0.5 * n,
          s"$tpe estimate $v too far from exact $n")
      }
    }
    // the sketch must plan as ONE partially-aggregated pass (the native
    // kmv_sketch buffer combines map-side) — no distinct exchange, no
    // per-group sort: the properties that keep the sketch cheap
    val plan = graft.ops.Sketches.kmvDistinct(e, "user_id", "event_type")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_kmv_sketch"),
      "KMV lost map-side partial aggregation")
    assert(!plan.contains("Window"),
      "KMV sketch path must not plan a window sort")
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1, s"KMV planned $exchanges exchanges — must be one")
  }

  test("winsorize clips to the discrete p-bounds and flags exactly the out-of-range rows") {
    // n = 100, bounds at p10/p90: lo rank = 1 + (99*10) div 100 = 10 →
    // value 10.0; hi rank = 1 + (99*90) div 100 = 90 → value 90.0
    val df = (1 to 100).map(i => (i.toLong, "g", i.toDouble))
      .toDF("id", "grp", "v")
    val got = graft.ops.Sketches
      .winsorize(df, "v", "grp", "id", loPct = 10, hiPct = 90)
      .as[(Long, String, Double, Double, Boolean)].collect()
    assert(got.length === 100)
    got.foreach { case (_, _, v, cv, fl) =>
      assert(cv === math.max(10.0, math.min(90.0, v)))
      assert(fl === (v < 10.0 || v > 90.0))
    }
    assert(got.count(_._5) === 19) // 1..9 low, 91..100 high
  }

  test("exact heavy hitters == naive aggregation, across partitionings and thresholds") {
    // mixed shape: hot keys, a medium background, an all-unique tail —
    // the MG candidate set varies with the partitioning, the OUTPUT of
    // the two-pass operator must not (exactness is partition-invariant)
    val rnd = new scala.util.Random(42)
    val data = Seq.fill(2000)(rnd.nextInt(1000).toLong) ++
      Seq.fill(500)(7L) ++ Seq.fill(200)(13L) ++ (10000L to 11000L)
    val n = data.size.toLong
    val want = (den: Long) => data.groupBy(identity)
      .map { case (k, v) => (k, v.size.toLong) }
      .filter { case (_, c) => c * den >= n }.toSet
    for (parts <- Seq(1, 3, 8); den <- Seq(5L, 50L, 500L)) {
      val df = data.toDF("k").repartition(parts)
      val got = graft.ops.Sketches.exactHeavyHitters(df, "k", den)
        .as[(Long, Long)].collect().toSet
      assert(got === want(den), s"parts=$parts den=$den")
    }
  }

  test("heavy hitters: exact-equality threshold edge is included, all-unique stream is empty") {
    // N = 100, den = 10: a key with count exactly 10 satisfies
    // n·den ≥ N with equality and must appear
    val edge = (Seq.fill(10)(1L) ++ (100L until 190L)).toDF("k")
    val gotEdge = graft.ops.Sketches.exactHeavyHitters(edge, "k", 10L)
      .as[(Long, Long)].collect().toSet
    assert(gotEdge === Set((1L, 10L)))
    // every key unique: nothing reaches N/den for den < N
    val uniq = (1L to 400L).toDF("k")
    assert(graft.ops.Sketches.exactHeavyHitters(uniq, "k", 100L).count() === 0)
  }

  test("heavy hitters: capacity below supportDen is rejected (MG guarantee)") {
    val df = Seq(1L, 2L, 3L).toDF("k")
    intercept[IllegalArgumentException] {
      graft.ops.Sketches.exactHeavyHitters(df, "k", 100L, capacity = 50)
    }
  }

  test("sampled quantiles track exact quantiles within sampling error") {
    val e = table(spark, sfDir, "events")
    val est = graft.ops.Sketches
      .sampledQuantiles(e, "value", "event_id", "event_type", samplePct = 20)
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> Seq(r._2, r._3, r._4)).toMap
    // exact percentile BANDS around each target: the sample quantile
    // must land inside a generous neighborhood of the true one (the
    // bit-exact check is the q27 DuckDB oracle; this pins tracking)
    val exact = e.groupBy("event_type")
      .agg(expr("percentile(value, array(0.30, 0.70, 0.88, 0.995, 0.94, 1.0))").as("b"))
      .as[(String, Seq[Double])].collect().toMap
    est.foreach { case (tpe, Seq(q50, q95, q99)) =>
      val b = exact(tpe)
      assert(q50 >= b(0) && q50 <= b(1), s"$tpe q50 $q50 outside [${b(0)}, ${b(1)}]")
      assert(q95 >= b(2) && q95 <= b(3), s"$tpe q95 $q95 outside [${b(2)}, ${b(3)}]")
      assert(q99 >= b(4) && q99 <= b(5), s"$tpe q99 $q99 outside [${b(4)}, ${b(5)}]")
      // ordered by construction
      assert(q50 <= q95 && q95 <= q99)
    }
    assert(est.nonEmpty)
  }

  test("kmvOverlap: below the knee the sketch estimate IS the exact Jaccard") {
    // union sizes < k ⇒ the bottom-k sketch holds the whole hash set, so
    // K_k(A∪B) ∩ A ∩ B is exactly the intersection — est == exact
    val rows = (1L to 30L).map(u => ("a", u)) ++
      (21L to 50L).map(u => ("b", u)) ++ // |a∩b| = 10, |a∪b| = 50
      (1L to 5L).map(u => ("c", u + 100))
    val df = rows.toDF("grp", "uid")
    val got = graft.ops.Sketches
      .kmvOverlap(df, keyCol = "uid", groupCol = "grp", k = 64)
      .as[(String, String, Long, Double, Double)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4, t._5))).toMap
    assert(got.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")))
    val (nab, estAb, exAb) = got(("a", "b"))
    assert(nab === 10L)
    assert(exAb === 0.2)
    assert(estAb === exAb)
    val (nac, estAc, exAc) = got(("a", "c"))
    assert(nac === 0L && estAc === 0.0 && exAc === 0.0)
  }

  test("kmvOverlap: above the knee the estimate stays within the k=64 error bound") {
    val e = table(spark, sfDir, "events")
    val got = graft.ops.Sketches
      .kmvOverlap(e, keyCol = "user_id", groupCol = "event_type", k = 64)
      .as[(String, String, Long, Double, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (a, b, _, est, exact) =>
      // k=64 bottom-k Jaccard: σ ≈ sqrt(j(1-j)/k) ≤ 0.0625; 4σ bound
      assert(math.abs(est - exact) <= 0.25, s"($a,$b) est=$est exact=$exact")
    }
  }

  test("kmvOverlap estimate is invariant to partitioning (mergeability)") {
    val e = table(spark, sfDir, "events")
    val one = graft.ops.Sketches
      .kmvOverlap(e.coalesce(1), "user_id", "event_type", k = 32)
      .collect().map(_.toSeq).toSet
    val many = graft.ops.Sketches
      .kmvOverlap(e.repartition(17), "user_id", "event_type", k = 32)
      .collect().map(_.toSeq).toSet
    assert(one === many)
  }
}
