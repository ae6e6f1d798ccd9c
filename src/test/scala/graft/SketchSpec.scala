package graft

import org.apache.spark.sql.functions._

import graft.Engine.table

/** Error bounds for the sketch aggregates (no SQL oracle — sketch
  * internals are engine-specific, so correctness is a bound vs the exact
  * aggregate, not a hash match).
  */
class SketchSpec extends SparkSessionSpec {
  import spark.implicits._

  test("HLL++ distinct within 3x configured rsd of exact") {
    val e = table(spark, sfDir, "events")
    val approx = SparkEntry.queries("q18_sketch_distinct")(spark, sfDir)
      .as[(String, Long)].collect().toMap
    val exact = e.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, n) =>
      val rel = math.abs(approx(k).toDouble - n) / n
      assert(rel <= 0.06, s"$k: approx=${approx(k)} exact=$n rel=$rel")
    }
  }

  test("quantile sketch brackets exact percentiles") {
    val e = table(spark, sfDir, "events")
    val approx = SparkEntry.queries("q19_sketch_quantiles")(spark, sfDir)
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> Seq(r._2, r._3, r._4)).toMap
    val exact = e.groupBy("event_type")
      .agg(expr("percentile(value, array(0.45, 0.55))").as("p50band"),
        expr("percentile(value, array(0.93, 0.97))").as("p95band"))
      .as[(String, Seq[Double], Seq[Double])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    exact.foreach { case (k, (p50band, p95band)) =>
      val Seq(a50, a95, _) = approx(k)
      assert(a50 >= p50band.head && a50 <= p50band.last,
        s"$k p50 $a50 outside ${p50band}")
      assert(a95 >= p95band.head && a95 <= p95band.last,
        s"$k p95 $a95 outside ${p95band}")
    }
  }
}
