package graft

import org.apache.spark.sql.functions._

import graft.Engine.table
import graft.ops.Profile

class ProfileSpec extends SparkSessionSpec {
  import spark.implicits._

  test("profile: hand-built nulls, duplicates, exact distincts") {
    val df = Seq(
      (Option(1L), Option("a")),
      (Option(1L), Option("b")),
      (Option.empty[Long], Option("b")),
      (Option(3L), Option.empty[String])
    ).toDF("x", "s")
    val got = Profile.profile(df, Seq("x", "s"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(("x", 4L, 1L, 2L), ("s", 4L, 1L, 2L)))
  }

  test("profile is a single pass: one scan, one Expand-based multi-distinct") {
    val p = Profile.profile(
        table(spark, sfDir, "events"),
        Seq("event_id", "user_id", "event_type"))
      .queryExecution.executedPlan.toString
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans === 1, s"profile planned $scans scans — must be one pass")
    assert(p.contains("Expand"), "multi-distinct lost the Expand plan")
  }

  test("mergeableStats: merge is bucket-count-invariant (the mergeability contract)") {
    val e = table(spark, sfDir, "events")
    def run(b: Int) = Profile
      .mergeableStats(e, "event_id", Seq("event_id", "user_id", "event_type"),
        nBuckets = b)
      .as[(String, Long, Long, Double, String, String)]
      .collect().sortBy(_._1).toSeq
    val direct = run(1) // one bucket == no sharding: the direct global path
    assert(run(8) === direct)
    assert(run(3) === direct)
  }

  test("mergeableStats agrees with the exact profile below the KMV knee") {
    val e = table(spark, sfDir, "events")
    val exact = Profile.profile(e, Seq("event_type"))
      .as[(String, Long, Long, Long)].collect().head
    val got = Profile
      .mergeableStats(e, "event_id", Seq("event_type"), nBuckets = 4)
      .as[(String, Long, Long, Double, String, String)].collect().head
    assert(got._2 === exact._2 && got._3 === exact._3)
    // event_type cardinality (5) is far below k=64: the KMV set is the
    // complete distinct set and the estimate must be EXACT
    assert(got._4 === exact._4.toDouble)
    // nulls: planted frame with nulls keeps the null column honest
    val withNulls = Seq(Option("a"), Option("a"), None, Option("b"))
      .toDF("s").withColumn("id", monotonically_increasing_id())
    val g2 = Profile.mergeableStats(withNulls, "id", Seq("s"), nBuckets = 2)
      .as[(String, Long, Long, Double, String, String)].collect().head
    assert(g2 === (("s", 4L, 1L, 2.0, "a", "b")))
  }

  test("mergeableStats is one scan for all columns, KMV partially aggregated") {
    val p = Profile.mergeableStats(
        table(spark, sfDir, "events"), "event_id",
        Seq("event_id", "user_id", "event_type"))
      .queryExecution.executedPlan.toString
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans === 1, s"mergeableStats planned $scans scans — must be one")
    assert(p.contains("partial_kmv_sketch"),
      "shard KMV lost map-side partial aggregation")
    assert(!p.contains("Window"), "sketch path must not plan a window sort")
  }
}
