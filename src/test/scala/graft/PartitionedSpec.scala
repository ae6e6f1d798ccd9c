package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.Engine.table
import graft.sources.Partitioned

class PartitionedSpec extends SparkSessionSpec {

  private lazy val root = {
    val d = Files.createTempDirectory("graft_partitioned").toString
    Partitioned.writeByDay(table(spark, sfDir, "events"), s"$d/events")
    s"$d/events"
  }

  test("day-partitioned round trip: same rows, ts precision intact") {
    val ev = table(spark, sfDir, "events")
    val back = spark.read.option("basePath", root).parquet(root).drop("dt")
    assert(back.count() === ev.count())
    val cols = ev.columns.map(col).toSeq
    assert(back.select(cols: _*).collect().map(_.toSeq).toSet ===
      ev.select(cols: _*).collect().map(_.toSeq).toSet)
  }

  test("a day-range read prunes at the DIRECTORY level (PartitionFilters)") {
    val days = spark.read.option("basePath", root).parquet(root)
      .select(date_format(col("dt"), "yyyy-MM-dd").as("dt"))
      .distinct().orderBy("dt").collect().map(_.getString(0))
    assert(days.length >= 3, s"need >=3 days to prove pruning, got ${days.length}")
    val day = days(1)
    val pruned = Partitioned.readDays(spark, root, day, day)
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.get
    // the dt predicate must be a PARTITION filter (directory pruning),
    // never a data filter that opens every footer
    assert(scan.partitionFilters.nonEmpty,
      "dt predicate did not land in PartitionFilters")
    pruned.collect()
    val partsRead = scan.metrics("numPartitions").value
    assert(partsRead === 1,
      s"one-day read touched $partsRead partition dirs (of ${days.length})")
    // and the rows equal the flat-table filter for the same day
    val expected = table(spark, sfDir, "events")
      .filter(date_format(col("ts"), "yyyy-MM-dd") === day).count()
    assert(pruned.count() === expected)
  }

  test("writer caps small files: one exchange keyed on dt, files per day bounded") {
    // the no-repartition form writes (tasks x days) files; the keyed
    // exchange caps it at shuffle-partition granularity per day
    val days = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("dt="))
    assert(days.nonEmpty)
    days.foreach { d =>
      val parts = d.listFiles().count(_.getName.startsWith("part-"))
      assert(parts <= 2,
        s"${d.getName} holds $parts part files — small-files explosion")
    }
  }
}
