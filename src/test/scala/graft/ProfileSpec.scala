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
}
