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

  test("compactDays: appends accumulate files; compaction bounds them, " +
      "rows/ts identical, out-of-range days untouched") {
    // fresh tree (the shared `root` is read by other cases): base write
    // plus 4 incremental appends of day-sliced batches
    val d = Files.createTempDirectory("graft_compact").toString + "/events"
    val ev = table(spark, sfDir, "events")
    Partitioned.writeByDay(ev, d)
    (1 to 4).foreach { i =>
      Partitioned.appendByDay(
        ev.filter(pmod(col("event_id"), lit(4)) === i % 4), d)
    }
    def files(day: java.io.File): Int =
      day.listFiles().count(_.getName.startsWith("part-"))
    val days = new java.io.File(d).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("dt="))
      .sortBy(_.getName)
    assert(days.length >= 4, "need >=4 days")
    assert(days.exists(files(_) > 2), "appends did not accumulate files")
    val dayNames = days.map(_.getName.stripPrefix("dt="))
    val (from, to) = (dayNames.head, dayNames(dayNames.length - 2))
    val lastDay = days.last
    val lastBefore = files(lastDay)
    val before = spark.read.option("basePath", d).parquet(d)
      .collect().map(_.toSeq).toSet
    Partitioned.compactDays(spark, d, from, to, targetFileMB = 128)
    // in-range days collapse to the byte-target bound (tiny test data →
    // 1 file); the out-of-range last day keeps its exact file set
    days.init.foreach { day =>
      assert(files(day) === 1, s"${day.getName} holds ${files(day)} files")
      assert(!day.listFiles().exists(_.getName == "_SUCCESS"))
    }
    assert(files(lastDay) === lastBefore, "out-of-range day was rewritten")
    // rows and timestamp precision bit-identical through the rewrite
    val after = spark.read.option("basePath", d).parquet(d)
      .collect().map(_.toSeq).toSet
    assert(after === before)
    // idempotent: a second run finds every day at-or-under target and
    // rewrites nothing (mtimes stable)
    val stamps = days.init.map(day => day.listFiles().map(_.lastModified()).toSeq)
    Partitioned.compactDays(spark, d, from, to, targetFileMB = 128)
    assert(days.init.map(day => day.listFiles().map(_.lastModified()).toSeq)
      .toSeq === stamps.toSeq)
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
