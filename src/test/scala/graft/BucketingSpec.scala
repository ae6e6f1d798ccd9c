package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Engine.table

/** Bucketed-table co-located joins: writing both join sides bucketed by
  * the key lets repeated fact-fact joins run with ZERO exchanges — at
  * 100 TB this converts every recurring orders⋈lineitem join from a
  * full-data shuffle into a local zip of bucket files. This spec proves
  * the engine's bucketing path end-to-end: write, catalog read, join,
  * no-Exchange plan, correct rows.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val warehouse = Files.createTempDirectory("graft_wh").toString
  lazy val spark = Engine.session(master = "local[4]")
  val sfDir = "/root/testdata/sf0.001"

  test("bucketed fact-fact join plans without exchanges and matches plain join") {
    import spark.implicits._
    table(spark, sfDir, "orders")
      .write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").option("path", s"$warehouse/orders_b")
      .saveAsTable("orders_b")
    table(spark, sfDir, "lineitem")
      .write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").option("path", s"$warehouse/lineitem_b")
      .saveAsTable("lineitem_b")

    // disable broadcast: at test scale Catalyst would broadcast instead,
    // and the point is the shuffle-free sort-merge path big-big joins use
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined =
      try {
        val j = spark.table("lineitem_b")
          .join(spark.table("orders_b"),
            col("l_orderkey") === col("o_orderkey"))
        val plan = j.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), plan)
        assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
        j.count()
      } finally
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
          (64L * 1024 * 1024).toString)

    val expected = table(spark, sfDir, "lineitem")
      .join(table(spark, sfDir, "orders"),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(joined === expected)
    assert(expected > 0)
  }

  test("partitionBy layout prunes partitions at the scan") {
    table(spark, sfDir, "events")
      .write.mode("overwrite").partitionBy("event_type")
      .parquet(s"$warehouse/events_p")
    val one = spark.read.parquet(s"$warehouse/events_p")
      .filter(col("event_type") === "purchase")
    val plan = one.queryExecution.executedPlan.toString
    // the filter must land in PartitionFilters (directory pruning), not
    // as a post-scan Filter over all partitions
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
    val expected = table(spark, sfDir, "events")
      .filter(col("event_type") === "purchase").count()
    assert(one.count() === expected)
  }
}
