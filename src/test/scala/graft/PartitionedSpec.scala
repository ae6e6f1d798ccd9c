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

  test("compaction runs against an explicit file:-scheme root (Hadoop FS)") {
    // the listing + two-rename swap must go through the Hadoop FS API:
    // a java.io.File control plane silently finds NO day dirs under a
    // scheme'd root and compacts nothing — worse than an error
    val d = Files.createTempDirectory("graft_part_uri").toString + "/events"
    val uri = s"file:$d"
    val ev = table(spark, sfDir, "events")
    Partitioned.writeByDay(ev, uri)
    Partitioned.appendByDay(ev, uri) // double the rows → >1 file per day
    def dayFiles(): Map[String, Int] = new java.io.File(d).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("dt="))
      .map(f => f.getName -> f.listFiles().count(_.getName.startsWith("part-")))
      .toMap
    val before = dayFiles()
    assert(before.nonEmpty && before.values.exists(_ > 1),
      "append through the scheme'd root did not accumulate files")
    val days = before.keys.map(_.stripPrefix("dt=")).toSeq.sorted
    Partitioned.compactDays(spark, uri, days.head, days.last, targetFileMB = 128)
    val after = dayFiles()
    assert(after.keySet === before.keySet, "compaction dropped a day dir")
    assert(after.values.forall(_ === 1),
      s"scheme'd-root compaction left multi-file days: $after")
    assert(Partitioned.readDays(spark, uri, days.head, days.last).count()
      === 2 * ev.count())
  }

  test("clustered compaction: manifest lands with the day, bandPrune " +
      "skips files, band read == unpruned filter, re-run rewrites nothing") {
    val d = Files.createTempDirectory("graft_cluster").toString + "/events"
    val ev = table(spark, sfDir, "events")
    Partitioned.writeByDay(ev, d)
    val days = new java.io.File(d).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("dt="))
      .map(_.getName.stripPrefix("dt=")).sorted
    assert(days.length >= 3)
    Partitioned.compactDays(spark, d, days.head, days.last,
      clusterBy = Seq("value"), minFilesPerDay = 4)
    // every in-range day carries its manifest and >= 2 files (the floor
    // is 4, but range partitions with few rows can come up empty)
    new java.io.File(d).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("dt=")).foreach {
        day =>
          assert(day.listFiles().exists(_.getName == ".stats.json"),
            s"${day.getName} has no manifest")
          assert(day.listFiles().count(_.getName.startsWith("part-")) >= 2,
            s"${day.getName} was not widened")
      }
    // a narrow band must PROVE most files disjoint and skip them
    val report = Partitioned.bandPrune(spark, d, days.head, days.last,
      "value", "100.0", "150.0")
    assert(report.skipped > 0,
      s"manifest pruned nothing (total=${report.total})")
    assert(report.selected.length < report.total)
    // and the pruned read is IDENTICAL to the unpruned filter
    val pruned = Partitioned
      .readDaysBand(spark, d, days.head, days.last, "value", 100.0, 150.0)
      .collect().map(_.toSeq).toSet
    val full = Partitioned.readDays(spark, d, days.head, days.last)
      .filter(col("value") >= 100.0 && col("value") <= 150.0)
      .collect().map(_.toSeq).toSet
    assert(pruned === full)
    assert(pruned.nonEmpty, "band selected no rows — vacuous gate")
    // idempotent: the clustered day is at-bound AND carries its manifest,
    // so a second clustered run rewrites nothing
    val dayDirs = new java.io.File(d).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("dt=")).sortBy(_.getName)
    val stamps = dayDirs.map(_.listFiles().map(_.lastModified()).toSeq).toSeq
    Partitioned.compactDays(spark, d, days.head, days.last,
      clusterBy = Seq("value"), minFilesPerDay = 4)
    assert(dayDirs.map(_.listFiles().map(_.lastModified()).toSeq).toSeq
      === stamps)
  }

  test("a stale manifest stays SOUND: files appended after clustering " +
      "are always read, never pruned") {
    val d = Files.createTempDirectory("graft_stale").toString + "/events"
    val ev = table(spark, sfDir, "events")
    Partitioned.writeByDay(ev.filter(pmod(col("event_id"), lit(2)) === 0), d)
    val days = new java.io.File(d).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("dt="))
      .map(_.getName.stripPrefix("dt=")).sorted
    Partitioned.compactDays(spark, d, days.head, days.last,
      clusterBy = Seq("value"), minFilesPerDay = 4)
    // append AFTER the manifest was written: the new files are unknown
    // to it, so the soundness rule (unknown => read) must cover them
    Partitioned.appendByDay(ev.filter(pmod(col("event_id"), lit(2)) === 1), d)
    val pruned = Partitioned
      .readDaysBand(spark, d, days.head, days.last, "value", 100.0, 150.0)
      .collect().map(_.toSeq).toSet
    val expected = Partitioned.readDays(spark, d, days.head, days.last)
      .filter(col("value") >= 100.0 && col("value") <= 150.0)
      .collect().map(_.toSeq).toSet
    assert(pruned === expected,
      "stale manifest dropped appended rows — pruning is UNSOUND")
    // the manifest still prunes among the files it knows (skipped > 0)
    // while selecting every unknown appended file
    val report = Partitioned.bandPrune(spark, d, days.head, days.last,
      "value", "100.0", "150.0")
    assert(report.skipped > 0, "stale manifest lost all pruning power")
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

  test("NaN stats never break band reads: an unparseable min/max bound " +
      "degrades to never-prune instead of throwing") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_nan").toString + "/events"
    // one NaN row per day: max(value) stringifies to "NaN", which
    // BigDecimal cannot parse — pre-fix every later band read threw
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 10.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 06:00:00"), Double.NaN),
      (3L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), 500.0),
      (4L, java.sql.Timestamp.valueOf("2024-01-02 06:00:00"), Double.NaN)
    ).toDF("event_id", "ts", "value")
    Partitioned.writeByDay(df, d)
    Partitioned.compactDays(spark, d, "2024-01-01", "2024-01-02",
      clusterBy = Seq("value"))
    val report = Partitioned.bandPrune(spark, d, "2024-01-01", "2024-01-02",
      "value", "5.0", "15.0")
    assert(report.selected.length === report.total,
      "a NaN-polluted range must never prune (bounds are unprovable)")
    val got = Partitioned
      .readDaysBand(spark, d, "2024-01-01", "2024-01-02", "value", 5.0, 15.0)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L))
  }

  test("a band proven empty by the manifest plans NO scan (empty relation, " +
      "not the unpruned full read)") {
    val d = Files.createTempDirectory("graft_emptyband").toString + "/events"
    val ev = table(spark, sfDir, "events")
    Partitioned.writeByDay(ev, d)
    val days = new java.io.File(d).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("dt="))
      .map(_.getName.stripPrefix("dt=")).sorted
    Partitioned.compactDays(spark, d, days.head, days.last,
      clusterBy = Seq("value"), minFilesPerDay = 4)
    // a band beyond every recorded max: pruning proves zero overlap
    val report = Partitioned.bandPrune(spark, d, days.head, days.last,
      "value", "1.0e15", "2.0e15")
    assert(report.total > 0 && report.selected.isEmpty,
      "gate needs a provably-empty band")
    val df = Partitioned.readDaysBand(spark, d, days.head, days.last,
      "value", 1.0e15, 2.0e15)
    assert(df.collect().isEmpty)
    // pre-fix this fell back to the FULL day-range scan exactly when
    // pruning proved no file could match
    assert(!df.queryExecution.executedPlan.exists(
      _.isInstanceOf[FileSourceScanExec]),
      "provably-empty band still planned a file scan")
  }
}
