package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.Engine.table
import graft.sources.VersionedLake

class VersionedLakeSpec extends SparkSessionSpec {

  private def freshRoot(): String =
    Files.createTempDirectory("graft_vlake").toString + "/events"

  test("append → commit → read round trip; versions are monotonic; " +
      "day-ranged reads prune from the manifest") {
    val d = freshRoot()
    val ev = table(spark, sfDir, "events")
    val v1 = VersionedLake.append(ev.filter(pmod(col("event_id"), lit(2)) === 0), d)
    val v2 = VersionedLake.append(ev.filter(pmod(col("event_id"), lit(2)) === 1), d)
    assert(v1 === 1L && v2 === 2L)
    val back = VersionedLake.read(spark, d).drop("dt")
    assert(back.count() === ev.count())
    val cols = ev.columns.map(col).toSeq
    assert(back.select(cols: _*).collect().map(_.toSeq).toSet ===
      ev.select(cols: _*).collect().map(_.toSeq).toSet)
    // a one-day read selects exactly that day's manifest entries
    val day = VersionedLake.snapshot(spark, d).files.map(_.dt).distinct.sorted.apply(1)
    val oneDay = VersionedLake.read(spark, d, None, day, day)
    val expected = ev.filter(date_format(col("ts"), "yyyy-MM-dd") === day).count()
    assert(oneDay.count() === expected)
  }

  test("snapshot isolation: a reader pinned to an old version survives a " +
      "compaction commit; vacuum then reclaims the old files") {
    val d = freshRoot()
    val ev = table(spark, sfDir, "events")
    val v1 = VersionedLake.append(ev.filter(pmod(col("event_id"), lit(2)) === 0), d)
    VersionedLake.append(ev.filter(pmod(col("event_id"), lit(2)) === 1), d)
    val snapBefore = VersionedLake.snapshot(spark, d)
    assert(snapBefore.files.groupBy(_.dt).values.exists(_.size > 1),
      "need multi-file days for compaction to rewrite")
    // pin a reader at v2's file list, then compact (publishes v3)
    val pinned = VersionedLake.read(spark, d, Some(snapBefore.version))
    val days = snapBefore.files.map(_.dt).distinct.sorted
    val v3 = VersionedLake.compact(spark, d, days.head, days.last)
    assert(v3 === snapBefore.version + 1)
    // old files are still on disk (immutable until vacuum), so the
    // pinned reader collects its full snapshot mid-"concurrent" commit
    assert(pinned.count() === ev.count())
    // the head is compacted: one file per day, same rows
    val snapAfter = VersionedLake.snapshot(spark, d)
    assert(snapAfter.files.groupBy(_.dt).values.forall(_.size === 1))
    assert(VersionedLake.read(spark, d).count() === ev.count())
    // vacuum to the latest version only → the rewritten files vanish,
    // old manifests go with them, the head still reads clean
    VersionedLake.vacuum(spark, d, retainVersions = 1)
    val liveNames = snapAfter.files.map(_.path).toSet
    val onDisk = new java.io.File(d).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("dt="))
      .flatMap(day => day.listFiles().filter(_.getName.startsWith("part-"))
        .map(f => s"${day.getName}/${f.getName}")).toSet
    assert(onDisk === liveNames,
      s"vacuum left orphans or deleted live files: ${onDisk.diff(liveNames)} / ${liveNames.diff(onDisk)}")
    intercept[RuntimeException] {
      VersionedLake.snapshot(spark, d, Some(v1)) // expired by retention
    }
    assert(VersionedLake.read(spark, d).count() === ev.count())
  }

  test("commit conflicts retry onto the next version and lose nothing " +
      "(a manifest name squatted by a concurrent committer)") {
    val d = freshRoot()
    val ev = table(spark, sfDir, "events")
    VersionedLake.append(ev.filter(pmod(col("event_id"), lit(2)) === 0), d)
    // simulate a concurrent committer that won v2: copy v1's manifest
    // bytes to the v2 name (a valid no-op commit — version lives in the
    // NAME, never the content, exactly so this replay is legal)
    val commits = new java.io.File(d, "_commits")
    val v1 = new java.io.File(commits, "v00000001.json")
    val v2 = new java.io.File(commits, "v00000002.json")
    Files.copy(v1.toPath, v2.toPath)
    // this writer must lose the race for v2, re-merge onto it, win v3
    val v = VersionedLake.append(ev.filter(pmod(col("event_id"), lit(2)) === 1), d)
    assert(v === 3L)
    assert(VersionedLake.read(spark, d).count() === ev.count())
  }

  test("a crashed (staged but uncommitted) write is invisible to readers " +
      "and swept by vacuum") {
    val d = freshRoot()
    val ev = table(spark, sfDir, "events")
    VersionedLake.append(ev, d)
    val before = VersionedLake.read(spark, d).count()
    // simulate the crash: data staged under .vstage_*, no commit
    ev.limit(100).write.mode("overwrite").parquet(s"$d/.vstage_crashed")
    assert(VersionedLake.read(spark, d).count() === before,
      "uncommitted staged files leaked into a read")
    VersionedLake.vacuum(spark, d)
    assert(!new java.io.File(s"$d/.vstage_crashed").exists(),
      "vacuum did not sweep the crashed stage dir")
    assert(VersionedLake.read(spark, d).count() === before)
  }
}
