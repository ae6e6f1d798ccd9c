package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned parquet layout — THE scan-pruning feature of a
  * 100 TB event lake: `dt=YYYY-MM-DD/` directories let a day-ranged
  * query read only its days' files (Catalyst partition pruning — the
  * predicate never even opens the other directories' footers), and
  * make retention/backfill per-day directory operations instead of
  * table rewrites.
  *
  * Scale discipline:
  *  - the partition column is a DERIVED day string; the original event
  *    timestamp rides unchanged inside the files, so layout is an
  *    ingest concern and queries keep full precision;
  *  - writers repartition by dt first: without it every input task
  *    holding k days writes k small files per task — the classic
  *    small-files explosion (days × tasks files). One exchange keyed
  *    on the partition column caps output at one file per day per
  *    shuffle partition;
  *  - readers pass `basePath` so the dt directory column stays
  *    available, and prune with a dt predicate (PartitionedSpec gates
  *    `PartitionFilters` in the scan — a filter that lands in
  *    `PushedFilters` instead is reading every directory).
  */
object Partitioned {

  /** Write `df` under `path` partitioned by the day of `tsCol`. */
  def writeByDay(df: DataFrame, path: String, tsCol: String = "ts"): Unit =
    df.withColumn("dt", date_format(col(tsCol), "yyyy-MM-dd"))
      .repartition(col("dt"))
      .write.mode("overwrite")
      .partitionBy("dt")
      .parquet(path)

  /** Read a day-partitioned table; `days` (inclusive bounds, "YYYY-MM-DD")
    * prunes at the DIRECTORY level before any file is opened. Partition
    * type inference reads `dt=...` dirs as DATE; the bounds coerce and
    * prune on that native column, and `dt` is cast back to the string
    * the writer derived so the column round-trips type-stable.
    */
  def readDays(
      spark: SparkSession, path: String,
      fromDay: String, toDay: String): DataFrame =
    spark.read.option("basePath", path).parquet(path)
      .filter(col("dt") >= fromDay && col("dt") <= toDay)
      .withColumn("dt", date_format(col("dt"), "yyyy-MM-dd"))

  /** Append a batch into an existing day tree (the incremental-ingest
    * path): same derived-dt + repartition discipline as [[writeByDay]],
    * appending files into the touched day directories. Each append adds
    * up to one file per day per shuffle partition — which is exactly why
    * a lake needs [[compactDays]] as periodic maintenance.
    */
  def appendByDay(df: DataFrame, path: String, tsCol: String = "ts"): Unit =
    df.withColumn("dt", date_format(col(tsCol), "yyyy-MM-dd"))
      .repartition(col("dt"))
      .write.mode("append")
      .partitionBy("dt")
      .parquet(path)

  /** Small-file compaction over a day range — the weekly maintenance op
    * of a real event lake: incremental appends accumulate files per day
    * (one per append × shuffle partition), and scan cost degrades with
    * file count long before data size grows. Each day in
    * [fromDay, toDay] is rewritten to `ceil(bytes / targetFileMB)`
    * files (min 1) and swapped in day by day:
    *  - days outside the range are never touched;
    *  - a day already at-or-under its target file count is skipped
    *    (no write amplification on repeat runs);
    *  - the swap is CRASH-SAFE but not reader-atomic: the rewrite lands
    *    in a hidden `.compact_tmp` sibling and replaces the day dir
    *    with two renames, so a crash at any point leaves either the old
    *    day dir or the fully-written new one recoverable — but between
    *    the two renames the day dir is briefly ABSENT, so a concurrent
    *    readDays over the range can drop the day or fail listing it.
    *    Compaction is a single-writer MAINTENANCE-WINDOW op: run it
    *    when no reader overlaps the range (true reader atomicity needs
    *    a manifest/commit log — Delta/Iceberg territory, out of scope);
    *  - rows and timestamp precision are bit-identical (plain parquet
    *    read → coalesce → write; no recompute touches the values).
    * Listing and the swap go through `org.apache.hadoop.fs.FileSystem`
    * resolved from the root's scheme, so the lake compacts equally on
    * `file:` and `hdfs:` roots (S3 caveat: renames are copy+delete —
    * slower and non-atomic; see the Store scaladoc).
    * Days are INDEPENDENT jobs over disjoint directories, so they fan
    * out on a small thread pool (`parallelism`, default 4 — Spark's
    * scheduler interleaves concurrent job submissions): a month's
    * maintenance costs ~max(day) instead of Σ(days), and each day's
    * swap stays individually crash-safe.
    */
  def compactDays(
      spark: SparkSession, path: String,
      fromDay: String, toDay: String, targetFileMB: Int = 128,
      parallelism: Int = 4): Unit = {
    val root = new Path(path)
    val fs: FileSystem =
      root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dayDirs = (if (fs.exists(root)) fs.listStatus(root) else Array.empty)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("dt="))
      .filter { s =>
        val day = s.getPath.getName.stripPrefix("dt=")
        day >= fromDay && day <= toDay // ISO day strings order lexically
      }
      .sortBy(_.getPath.getName)
    val targetBytes = targetFileMB.toLong * 1024 * 1024
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(parallelism, math.max(1, dayDirs.length))))
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def compactOne(dayStatus: org.apache.hadoop.fs.FileStatus): Unit = {
      val dayDir = dayStatus.getPath
      // any non-hidden file is data: batch writers emit part-*, the
      // streaming LakeSink emits batch-stamped bN-part-* names
      val parts = fs.listStatus(dayDir).filter { s =>
        val n = s.getPath.getName
        s.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      val bytes = parts.map(_.getLen).sum
      val want = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      if (parts.length > want) {
        val tmp = new Path(root, s".compact_tmp_${dayDir.getName}")
        // day files carry no dt column (partitionBy strips it) — the
        // rewrite is a plain parquet round-trip of the same schema
        spark.read.parquet(dayDir.toString)
          .coalesce(want)
          .write.mode("overwrite").parquet(tmp.toString)
        // drop Spark's _SUCCESS marker: day dirs hold only part files
        fs.delete(new Path(tmp, "_SUCCESS"), false): Unit
        val trash = new Path(root, s".compact_old_${dayDir.getName}")
        if (!fs.rename(dayDir, trash))
          sys.error(s"compactDays: cannot swap out ${dayDir.getName}")
        if (!fs.rename(tmp, dayDir)) {
          fs.rename(trash, dayDir) // roll back — old data stays live
          sys.error(s"compactDays: cannot swap in ${dayDir.getName}")
        }
        fs.delete(trash, true): Unit
      }
    }
    try {
      dayDirs.foreach { d =>
        pool.execute(() =>
          try compactOne(d) catch { case t: Throwable => failures.add(t); () })
      }
      pool.shutdown()
      pool.awaitTermination(24, java.util.concurrent.TimeUnit.HOURS): Unit
    } finally pool.shutdownNow()
    if (!failures.isEmpty) throw failures.peek()
  }
}
