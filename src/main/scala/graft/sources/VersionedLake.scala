package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Day-partitioned lake with a MANIFEST COMMIT LOG — the reader-atomicity
  * upgrade [[Partitioned.compactDays]]'s scaladoc defers to "Delta/Iceberg
  * territory": there, the two-rename swap leaves a visibility gap where a
  * concurrent reader can drop a day. Here no reader ever lists
  * directories at all — the set of live data files IS the latest manifest
  * under `_commits/`, data files are IMMUTABLE once committed (writers
  * only add files; nothing is deleted until [[vacuum]]), and every write
  * is one atomic manifest publish:
  *
  *  - `_commits/v0000000N.json` — one JSON-lines manifest per version:
  *    a header line carrying the table schema, then one line per live
  *    data file (relative path, day, rows, bytes). A manifest is the
  *    FULL snapshot, not a delta — O(files) text, parsed driver-side,
  *    no log replay on read (at 100 TB with 128 MB files that is ~10⁶
  *    lines — megabytes of driver JSON, same order as Spark's own file
  *    index for one scan);
  *  - COMMIT = `FileSystem.create(vN+1, overwrite = false)`: on HDFS an
  *    atomic create-if-absent, so two racing committers cannot both win
  *    a version — the loser re-reads the new latest, re-merges its file
  *    list (appends and compactions COMMUTE: an append only adds
  *    entries, a compaction only replaces the exact entries it read),
  *    and retries on the next number. Object stores without atomic
  *    create need an external lock/conditional-put for this step — the
  *    documented Delta-on-S3 caveat, out of scope here;
  *  - READERS are snapshot-isolated for free: a query plans against the
  *    file list of the manifest it loaded, and since committed files are
  *    immutable and vacuum-protected, a compaction publishing v+1 mid-
  *    query changes nothing the running query references. Time travel is
  *    the same mechanism pointed at an older version;
  *  - data files land via stage-then-move BEFORE the commit, so a crash
  *    leaves orphan files that no manifest references — invisible to
  *    every reader, swept by [[vacuum]] along with files only referenced
  *    by expired versions.
  *
  * Scale shape: appends shuffle once keyed on dt (the [[Partitioned]]
  * small-files discipline), compaction rewrites only the days it names
  * and costs ~max(day) on its thread pool, reads open exactly the
  * manifest's files (day-range pruning is a driver-side filter on the
  * entries — no directory listing of a 10⁵-day tree), and the control
  * plane is all Hadoop FileSystem (file:/hdfs: alike).
  */
object VersionedLake {

  private val CommitDir = "_commits"
  private val VName = """v(\d{8})\.json""".r

  /** One live data file in a snapshot. `path` is root-relative
    * (`dt=YYYY-MM-DD/<name>`), so manifests survive a lake relocation.
    * `stats` carries optional per-column (min, max) string pairs — the
    * data-skipping index living IN the commit log (the Delta/Iceberg
    * arrangement, vs [[Partitioned]]'s per-day sidecar): entries without
    * stats for a column are simply never pruned on it.
    */
  final case class FileEntry(path: String, dt: String, rows: Long,
      bytes: Long, stats: Map[String, (String, String)] = Map.empty)

  /** A committed version: the table schema plus its full live-file set.
    * The version number is carried by the manifest FILE NAME (the atomic
    * create is on the name), never duplicated inside the content.
    * `lastBatchId` is the streaming high-water mark (see [[appendBatch]];
    * -1 when no batch commit has happened).
    */
  final case class Snapshot(version: Long, schema: StructType,
      files: Seq[FileEntry], lastBatchId: Long = -1L, op: String = "")

  /** One line of [[history]]: what each commit did, at a glance. */
  final case class Commit(version: Long, op: String, nFiles: Int,
      rows: Long, bytes: Long, lastBatchId: Long)

  private def fsOf(spark: SparkSession, root: Path): FileSystem =
    root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Per-file row counts (and optional per-column min/max strings) for an
    * explicit file list, keyed by the last two path components
    * (`dt=DAY/name` — basenames alone collide when one writer task holds
    * two days). One tiny metadata job over just the listed files.
    */
  private def perFileStats(spark: SparkSession, paths: Seq[String],
      statsCols: Seq[String])
      : Map[String, (Long, Map[String, (String, String)])] =
    if (paths.isEmpty) Map.empty
    else {
      val aggs = count(lit(1)).as("rows") +: statsCols.flatMap(c => Seq(
        min(col(c)).cast("string").as(s"min:$c"),
        max(col(c)).cast("string").as(s"max:$c")))
      spark.read.parquet(paths: _*)
        .select(col("_metadata.file_path").as("f") +: statsCols.map(col): _*)
        .groupBy("f").agg(aggs.head, aggs.tail: _*).collect()
        .map { r =>
          val key = r.getString(0).split('/').takeRight(2).mkString("/")
          val ranges = statsCols.zipWithIndex.flatMap { case (c, i) =>
            val (mn, mx) = (r.getString(2 + 2 * i), r.getString(3 + 2 * i))
            if (mn == null || mx == null) None else Some(c -> (mn, mx))
          }.toMap
          key -> (r.getLong(1), ranges)
        }.toMap
    }

  private def commitPath(root: Path, v: Long) =
    new Path(root, f"$CommitDir/v$v%08d.json")

  /** Highest committed version, or None for a virgin root. */
  def latestVersion(spark: SparkSession, path: String): Option[Long] = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val dir = new Path(root, CommitDir)
    if (!fs.exists(dir)) None
    else fs.listStatus(dir).toSeq
      .collect { case s if s.isFile =>
        s.getPath.getName match {
          case VName(n) => Some(n.toLong)
          case _        => None
        }
      }.flatten match {
        case Nil => None
        case vs  => Some(vs.max)
      }
  }

  /** Load a committed snapshot (latest when `version` is None). */
  def snapshot(spark: SparkSession, path: String,
      version: Option[Long] = None): Snapshot = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val v = version.orElse(latestVersion(spark, path)).getOrElse(
      sys.error(s"VersionedLake: no committed version under $path"))
    val p = commitPath(root, v)
    if (!fs.exists(p))
      sys.error(s"VersionedLake: version $v does not exist under $path")
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val lines = text.linesIterator.filter(_.nonEmpty).toSeq
    val header = om.readTree(lines.head)
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(header.get("schema").asText()).asInstanceOf[StructType]
    val lastBatch =
      if (header.has("last_batch_id")) header.get("last_batch_id").asLong()
      else -1L
    val op = if (header.has("op")) header.get("op").asText() else ""
    val files = lines.tail.map { l =>
      val n = om.readTree(l)
      val stats =
        if (!n.has("stats")) Map.empty[String, (String, String)]
        else {
          val it = n.get("stats").fields()
          val b = Map.newBuilder[String, (String, String)]
          while (it.hasNext) {
            val e = it.next()
            b += e.getKey -> (e.getValue.get("min").asText(),
              e.getValue.get("max").asText())
          }
          b.result()
        }
      FileEntry(n.get("path").asText(), n.get("dt").asText(),
        n.get("rows").asLong(), n.get("bytes").asLong(), stats)
    }
    Snapshot(v, schema, files, lastBatch, op)
  }

  /** The commit log at a glance, oldest first — one driver-side header
    * read per retained version (expired versions are gone with their
    * manifests). The `op` trail is the audit view: which versions were
    * ingest, which were maintenance, which rolled back what.
    */
  def history(spark: SparkSession, path: String): Seq[Commit] = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val dir = new Path(root, CommitDir)
    if (!fs.exists(dir)) return Nil
    fs.listStatus(dir).toSeq.collect {
      case s if s.isFile =>
        s.getPath.getName match {
          case VName(n) => Some(n.toLong)
          case _        => None
        }
    }.flatten.sorted.map { v =>
      val snap = snapshot(spark, path, Some(v))
      Commit(v, snap.op, snap.files.length, snap.files.map(_.rows).sum,
        snap.files.map(_.bytes).sum, snap.lastBatchId)
    }
  }

  private def writeManifest(fs: FileSystem, root: Path, v: Long,
      schema: StructType, files: Seq[FileEntry],
      lastBatchId: Long, op: String): Boolean = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val sb = new StringBuilder
    val head = om.createObjectNode()
    head.put("schema", schema.json)
    head.put("n_files", files.length)
    head.put("last_batch_id", lastBatchId)
    head.put("op", op)
    sb.append(om.writeValueAsString(head)).append('\n')
    files.sortBy(f => (f.dt, f.path)).foreach { f =>
      val n = om.createObjectNode()
      n.put("path", f.path)
      n.put("dt", f.dt)
      n.put("rows", f.rows)
      n.put("bytes", f.bytes)
      if (f.stats.nonEmpty) {
        val st = n.putObject("stats")
        f.stats.toSeq.sortBy(_._1).foreach { case (c, (mn, mx)) =>
          val cn = st.putObject(c)
          cn.put("min", mn)
          cn.put("max", mx)
        }
      }
      sb.append(om.writeValueAsString(n)).append('\n')
    }
    fs.mkdirs(new Path(root, CommitDir))
    // create-if-absent IS the commit: exactly one committer wins vN
    val out =
      try fs.create(commitPath(root, v), false)
      catch { case _: java.io.IOException => return false }
    try out.write(sb.toString.getBytes("UTF-8")) finally out.close()
    true
  }

  /** Optimistic-concurrency commit loop: re-read the latest snapshot,
    * merge this writer's intent on top of it, try the next version
    * number. `merge` must be REPLAYABLE against any newer snapshot —
    * append merges by adding entries; compact merges by substituting
    * exactly the entries it rewrote (and keeping everything else, so a
    * concurrent append to the same day survives).
    *
    * CONCURRENCY CONTRACT (what the blind re-merge does and does not
    * serialize): APPENDS commute with every other op — they only add
    * entries nobody else references. Two MAINTENANCE ops (compact /
    * delete / upsert) racing over OVERLAPPING entries do not: each
    * substitutes files derived from the entries it READ, so the loser's
    * re-merge would re-publish rewrites carrying the winner's removed
    * rows (a compact replaying over a delete resurrects the deleted
    * band). Run maintenance single-writer per day range — the same
    * scheduling contract as [[Partitioned.compactDays]]'s maintenance
    * window; true conflict DETECTION (abort when a replayed merge's
    * read-set changed) is the Delta/Iceberg refinement, out of scope.
    */
  private def commit(spark: SparkSession, root: Path, schema: StructType,
      merge: Seq[FileEntry] => Seq[FileEntry],
      batchId: Option[Long] = None, op: String = "append"): Long = {
    val fs = fsOf(spark, root)
    var attempt = 0
    while (attempt < 50) {
      val base = latestVersion(spark, root.toString)
      val (v, files, prevBatch) = base match {
        case Some(b) =>
          val s = snapshot(spark, root.toString, Some(b))
          (b + 1, merge(s.files), s.lastBatchId)
        case None => (1L, merge(Nil), -1L)
      }
      val hwm = math.max(prevBatch, batchId.getOrElse(-1L))
      if (writeManifest(fs, root, v, schema, files, hwm, op)) return v
      attempt += 1 // lost the race — replay the merge on the new latest
    }
    sys.error("VersionedLake: commit contention exceeded 50 attempts")
  }

  /** Stage `df` partitioned by the day of `tsCol`, move the files into
    * the day dirs, and publish them in one atomic commit. Returns the
    * committed version. Crash-safe: files without a manifest entry are
    * invisible orphans until [[vacuum]] sweeps them. `statsCols` records
    * per-file min/max in the manifest for [[readBand]] skipping (append
    * files carry whatever ranges the shuffle produced — coarse until
    * [[compact]] clusters them tight).
    */
  def append(df: DataFrame, path: String, tsCol: String = "ts",
      statsCols: Seq[String] = Nil): Long =
    appendInternal(df, path, tsCol, statsCols, batchId = None)

  /** One micro-batch's EXACTLY-ONCE append (the streaming sink unit —
    * see [[sink]]): foreachBatch is at-least-once, and here idempotence
    * is one header check instead of [[graft.streaming.LakeSink]]'s
    * stamped-file sweep — the manifest's `last_batch_id` high-water mark
    * is committed ATOMICALLY WITH the files it covers, so
    *  - a replayed batch whose id is ≤ the mark returns without writing
    *    (its rows are provably in the snapshot — same commit);
    *  - a half-done replay (files moved, commit lost) left only
    *    manifest-less orphans: invisible to readers, swept by [[vacuum]],
    *    and the re-run moves fresh uniquely-named files and commits them
    *    exactly once.
    * Assumes ONE streaming writer per lake (batch ids from one
    * checkpoint are monotone — the Structured Streaming contract);
    * concurrent BATCH appends/compactions still commute with it.
    */
  def appendBatch(df: DataFrame, path: String, batchId: Long,
      tsCol: String = "ts", statsCols: Seq[String] = Nil): Long = {
    val spark = df.sparkSession
    latestVersion(spark, path) match {
      case Some(v)
          if snapshot(spark, path, Some(v)).lastBatchId >= batchId =>
        v // replay of a fully-committed batch — nothing to do
      case _ => appendInternal(df, path, tsCol, statsCols, Some(batchId))
    }
  }

  /** Run an append-mode streaming DataFrame into the versioned lake:
    * each micro-batch is one [[appendBatch]] commit, so the stream gets
    * snapshot-isolated readers, exactly-once replays, and [[compact]] /
    * [[vacuum]] maintenance with no extra machinery.
    */
  def sink(df: DataFrame, path: String, checkpointDir: String,
      tsCol: String = "ts", statsCols: Seq[String] = Nil)
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            batchId: Long) =>
          // pin the batch (the KVSink/LakeSink discipline): the stage
          // write and the stats job are separate actions on a stateful
          // lineage that must not re-execute
          val pinned = batch.toDF().localCheckpoint()
          try appendBatch(pinned, path, batchId, tsCol, statsCols): Unit
          finally org.apache.spark.sql.GraftBridge.unpersistCheckpoint(pinned)
      }
      .start()

  private def appendInternal(df: DataFrame, path: String, tsCol: String,
      statsCols: Seq[String], batchId: Option[Long]): Long = {
    val spark = df.sparkSession
    val root = new Path(path)
    val entries = stageAndMove(df, path, tsCol, statsCols)
    commit(spark, root, df.drop("dt").schema, prev => prev ++ entries,
      batchId, if (batchId.isDefined) "append-batch" else "append")
  }

  /** Stage `df` day-partitioned, move its files into the live day dirs,
    * and return their manifest entries WITHOUT committing — the moved
    * files are invisible orphans until a caller publishes them
    * ([[appendInternal]] commits them alone; [[upsert]] folds them into
    * one commit with its substitutions).
    */
  private def stageAndMove(df: DataFrame, path: String, tsCol: String,
      statsCols: Seq[String]): Seq[FileEntry] = {
    val spark = df.sparkSession
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val dated = df.withColumn("dt", date_format(col(tsCol), "yyyy-MM-dd"))
    val schema = dated.drop("dt").schema
    // schema drift guard: committed files are immutable and read as an
    // explicit list, so a divergent append would poison the table with
    // mixed file schemas that surface as silent column loss on read —
    // fail LOUDLY at the write boundary instead (field order is layout,
    // not identity; evolution = a new lake + an explicit backfill)
    latestVersion(spark, path).foreach { v =>
      val committed = snapshot(spark, path, Some(v)).schema
      val norm = (s: StructType) =>
        s.fields.map(f => (f.name, f.dataType)).sortBy(_._1).toSeq
      require(norm(schema) == norm(committed),
        s"VersionedLake: append schema ${schema.simpleString} does not " +
          s"match the committed schema ${committed.simpleString}")
    }
    val stage = new Path(root,
      s".vstage_${java.util.UUID.randomUUID.toString.take(8)}")
    dated.repartition(col("dt"))
      .write.mode("overwrite").partitionBy("dt").parquet(stage.toString)
    val moved = fs.listStatus(stage)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("dt="))
      .flatMap { dayDir =>
        val day = dayDir.getPath.getName.stripPrefix("dt=")
        val live = new Path(root, s"dt=$day")
        fs.mkdirs(live)
        fs.listStatus(dayDir.getPath)
          .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
          .map { f =>
            // staged part names carry a per-job UUID, so moves never
            // collide with files from other commits
            val target = new Path(live, f.getPath.getName)
            if (!fs.rename(f.getPath, target))
              throw new java.io.IOException(
                s"VersionedLake: rename ${f.getPath} -> $target failed")
            (day, f.getPath.getName, f.getLen)
          }
      }.toSeq
    fs.delete(stage, true): Unit
    // per-file row counts + stats: one tiny metadata aggregation over
    // just this batch's files (the LakeSink day-probe cost class).
    // Computed AFTER the move — Spark's file index silently drops a
    // dot-hidden stage root — and keyed by dt=DAY/name: a task holding
    // two days writes the SAME basename under both, so bare names
    // collide. The files are moved-but-uncommitted here: invisible to
    // every reader; a crash before commit leaves vacuum-sweepable
    // orphans.
    val base = fs.makeQualified(root).toString
    val stats = perFileStats(spark,
      moved.map { case (day, name, _) => s"$base/dt=$day/$name" }, statsCols)
    moved.map { case (day, name, len) =>
      val (rows, ranges) =
        stats.getOrElse(s"dt=$day/$name", (0L, Map.empty[String, (String, String)]))
      FileEntry(s"dt=$day/$name", day, rows, len, ranges)
    }
  }

  /** Read a snapshot (latest when `version` is None), day-ranged when
    * bounds are given. Pruning is a driver-side filter on manifest
    * entries — no directory walks; `basePath` keeps the dt partition
    * column alive on the explicit file list, type-stable with
    * [[Partitioned.readDays]].
    */
  def read(spark: SparkSession, path: String,
      version: Option[Long] = None,
      fromDay: String = "0000-01-01",
      toDay: String = "9999-12-31"): DataFrame = {
    val snap = snapshot(spark, path, version)
    val picked = snap.files.filter(f => f.dt >= fromDay && f.dt <= toDay)
    if (picked.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        snap.schema.add("dt", "string"))
    else {
      val root = new Path(path)
      val fs = fsOf(spark, root)
      val base = fs.makeQualified(root).toString
      spark.read.option("basePath", base)
        .parquet(picked.map(f => s"$base/${f.path}"): _*)
        .withColumn("dt", date_format(col("dt"), "yyyy-MM-dd"))
    }
  }

  /** Which manifest entries a `bandCol ∈ [lo, hi]` read must open
    * (exposed for tests/observability): entries without stats for the
    * column always survive — the [[Partitioned.bandPrune]] soundness
    * contract, with the ranges read from the commit log instead of a
    * sidecar. The column's dtype comes from the manifest schema.
    */
  def bandReport(spark: SparkSession, path: String, bandCol: String,
      lo: String, hi: String, version: Option[Long] = None,
      fromDay: String = "0000-01-01", toDay: String = "9999-12-31")
      : Partitioned.PruneReport = {
    val snap = snapshot(spark, path, version)
    val dtype = snap.schema(bandCol).dataType.simpleString
    val inDays = snap.files.filter(f => f.dt >= fromDay && f.dt <= toDay)
    val selected = inDays.filter { f =>
      f.stats.get(bandCol) match {
        case Some((mn, mx)) => StatsCompare.overlaps(dtype, mn, mx, lo, hi)
        case None           => true // no recorded range — must read
      }
    }.map(_.path)
    Partitioned.PruneReport(selected, inDays.length,
      inDays.length - selected.length)
  }

  /** Day-ranged band read, file-pruned by the manifest stats. Result is
    * IDENTICAL to `read(...).filter(bandCol between lo and hi)` — stats
    * only decide which files open; the predicate still runs per row (and
    * pushes into the surviving scans for row-group skipping on the same
    * clustered layout).
    */
  def readBand(spark: SparkSession, path: String, bandCol: String,
      lo: Double, hi: Double, version: Option[Long] = None,
      fromDay: String = "0000-01-01", toDay: String = "9999-12-31")
      : DataFrame = {
    val report = bandReport(spark, path, bandCol,
      lo.toString, hi.toString, version, fromDay, toDay)
    val base =
      if (report.selected.isEmpty || report.skipped == 0)
        read(spark, path, version, fromDay, toDay)
      else {
        val root = new Path(path)
        val fs = fsOf(spark, root)
        val qualified = fs.makeQualified(root).toString
        spark.read.option("basePath", qualified)
          .parquet(report.selected.map(p => s"$qualified/$p"): _*)
          .withColumn("dt", date_format(col("dt"), "yyyy-MM-dd"))
      }
    base.filter(col(bandCol) >= lo && col(bandCol) <= hi)
  }

  /** Compact each day in [fromDay, toDay] of the LATEST snapshot down to
    * `ceil(bytes / targetFileMB)` files (floored at `minFilesPerDay`) and
    * publish the substitution atomically. Readers of older versions keep
    * their files — nothing is deleted here ([[vacuum]] reclaims). Days
    * already at-or-under their bound are skipped (a clustered run
    * rewrites a day once — per-file stats on every entry of the day are
    * the idempotence witness). Returns the committed version (the latest
    * version when every day was already compact).
    *
    * `clusterBy` range-partitions + sorts each day on the key, so every
    * output file owns a disjoint key range and the manifest stats it
    * records (for `clusterBy ++ statsCols`) make [[readBand]] skip every
    * non-overlapping file — [[Partitioned.compactDays]]'s clustering with
    * the stats in the commit log instead of a sidecar.
    */
  def compact(spark: SparkSession, path: String,
      fromDay: String, toDay: String, targetFileMB: Int = 128,
      parallelism: Int = 4, minFilesPerDay: Int = 1,
      clusterBy: Seq[String] = Nil, statsCols: Seq[String] = Nil): Long = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val snap = snapshot(spark, path, None)
    val base = fs.makeQualified(root).toString
    val targetBytes = targetFileMB.toLong * 1024 * 1024
    val byDay = snap.files.filter(f => f.dt >= fromDay && f.dt <= toDay)
      .groupBy(_.dt).toSeq.sortBy(_._1)
    val replaced = new java.util.concurrent.ConcurrentLinkedQueue[FileEntry]()
    val added = new java.util.concurrent.ConcurrentLinkedQueue[FileEntry]()
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(parallelism, math.max(1, byDay.length))))
    val manifestCols = (clusterBy ++ statsCols).distinct
    def compactOne(day: String, entries: Seq[FileEntry]): Unit = {
      val bytes = entries.map(_.bytes).sum
      val want = math.max(minFilesPerDay.toLong,
        math.max(1L, (bytes + targetBytes - 1) / targetBytes)).toInt
      // at-bound days are skipped, EXCEPT when this run would add stats
      // the day's entries don't carry yet (the clustered-run witness)
      val alreadyDone = entries.length <= want &&
        manifestCols.forall(c => entries.forall(_.stats.contains(c)))
      if (!alreadyDone) {
        val stage = new Path(root,
          s".vstage_compact_${day}_${java.util.UUID.randomUUID.toString.take(8)}")
        val dayDf = spark.read.parquet(entries.map(e => s"$base/${e.path}"): _*)
        val laid =
          if (clusterBy.isEmpty) dayDf.coalesce(want)
          // disjoint key ranges per file — tight stats, maximal skipping
          else dayDf.repartitionByRange(want, clusterBy.map(col): _*)
            .sortWithinPartitions(clusterBy.map(col): _*)
        laid.write.mode("overwrite").parquet(stage.toString)
        val live = new Path(root, s"dt=$day")
        val rows = entries.map(_.rows).sum
        val moved = fs.listStatus(stage)
          .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
          .map { f =>
            val target = new Path(live, f.getPath.getName)
            if (!fs.rename(f.getPath, target))
              throw new java.io.IOException(
                s"VersionedLake: rename ${f.getPath} -> $target failed")
            (f.getPath.getName, f.getLen)
          }
        fs.delete(stage, true): Unit
        // per-file rows + stats for the rewritten files: one tiny
        // metadata job over just this day's new files (the append-path
        // cost class); the total doubles as a lossless-rewrite tripwire
        val stats = perFileStats(spark,
          moved.map(m => s"$base/dt=$day/${m._1}"), manifestCols)
        require(stats.values.map(_._1).sum == rows,
          s"VersionedLake: compaction of $day changed row count")
        entries.foreach(replaced.add)
        moved.foreach { case (name, len) =>
          val (n, ranges) = stats.getOrElse(s"dt=$day/$name",
            (0L, Map.empty[String, (String, String)]))
          added.add(FileEntry(s"dt=$day/$name", day, n, len, ranges))
        }
      }
    }
    try {
      byDay.foreach { case (day, entries) =>
        pool.execute(() =>
          try compactOne(day, entries)
          catch { case t: Throwable => failures.add(t); () })
      }
      pool.shutdown()
      pool.awaitTermination(24, java.util.concurrent.TimeUnit.HOURS): Unit
    } finally pool.shutdownNow()
    if (!failures.isEmpty) throw failures.peek()
    if (replaced.isEmpty) snap.version
    else {
      val dead = {
        val it = replaced.iterator(); val b = Seq.newBuilder[FileEntry]
        while (it.hasNext) b += it.next(); b.result().map(_.path).toSet
      }
      val fresh = {
        val it = added.iterator(); val b = Seq.newBuilder[FileEntry]
        while (it.hasNext) b += it.next(); b.result()
      }
      // the merge substitutes ONLY what this run rewrote: files a racing
      // append committed meanwhile stay live (append/compact commute)
      commit(spark, root, snap.schema,
        prev => prev.filterNot(f => dead(f.path)) ++ fresh,
        op = "compact")
    }
  }

  /** COPY-ON-WRITE DELETE (the retention/right-to-erasure op a 100 TB
    * training lake cannot live without): remove every row matching
    * `predicate` from the LATEST snapshot, by rewriting ONLY the files
    * that actually contain matches and publishing the substitution as
    * one atomic commit. Rows where the predicate is NULL are KEPT (a
    * null is not a match — the SQL DELETE convention). Semantics per
    * snapshot: the new version has the rows filtered out; OLDER versions
    * still carry them (time travel is the audit trail), so a true purge
    * is `deleteWhere` + [[vacuum]] down to the post-delete version.
    *
    * Cost shape: one match-count scan over the candidate files (grouped
    * by `_metadata.file_path` — per-file match counts in a single job),
    * then one rewrite job per touched DAY over only its touched files.
    * Untouched files keep their entries (and their stats) verbatim —
    * zero write amplification outside the blast radius. [[deleteBand]]
    * shrinks the candidate set further using manifest stats BEFORE any
    * footer opens — the read-path skipping contract applied to writes.
    */
  def deleteWhere(spark: SparkSession, path: String,
      predicate: org.apache.spark.sql.Column,
      fromDay: String = "0000-01-01", toDay: String = "9999-12-31"): Long = {
    val snap = snapshot(spark, path, None)
    val candidates = snap.files.filter(f => f.dt >= fromDay && f.dt <= toDay)
    deleteFromFiles(spark, path, snap, candidates, predicate)
  }

  /** [[deleteWhere]] for a band predicate, with the candidate files
    * pruned by manifest stats first: a file whose recorded [min, max]
    * cannot intersect [lo, hi] provably holds no matches and is never
    * even SCANNED — on a clustered lake a narrow delete touches O(band)
    * files of the whole corpus. Stat-less entries stay candidates
    * (soundness over speed, as on the read path).
    */
  def deleteBand(spark: SparkSession, path: String, bandCol: String,
      lo: Double, hi: Double,
      fromDay: String = "0000-01-01", toDay: String = "9999-12-31"): Long = {
    val snap = snapshot(spark, path, None)
    val report = bandReport(spark, path, bandCol, lo.toString, hi.toString,
      None, fromDay, toDay)
    val picked = report.selected.toSet
    val candidates = snap.files.filter(f => picked(f.path))
    deleteFromFiles(spark, path, snap, candidates,
      col(bandCol) >= lo && col(bandCol) <= hi)
  }

  private def deleteFromFiles(spark: SparkSession, path: String,
      snap: Snapshot, candidates: Seq[FileEntry],
      predicate: org.apache.spark.sql.Column): Long = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val base = fs.makeQualified(root).toString
    if (candidates.isEmpty) return snap.version
    // one job: per-file match counts over just the candidates
    val isMatch = coalesce(predicate, lit(false)) // NULL is not a match
    val matches = spark.read
      .parquet(candidates.map(e => s"$base/${e.path}"): _*)
      .filter(isMatch)
      .groupBy(col("_metadata.file_path").as("f")).count().collect()
      .map(r => r.getString(0).split('/').takeRight(2).mkString("/")
        -> r.getLong(1)).toMap
    val touched = candidates.filter(e => matches.contains(e.path))
    if (touched.isEmpty) return snap.version
    val added = Seq.newBuilder[FileEntry]
    touched.groupBy(_.dt).toSeq.sortBy(_._1).foreach { case (day, entries) =>
      val statsCols = entries.flatMap(_.stats.keys).distinct
      val stage = new Path(root,
        s".vstage_delete_${day}_${java.util.UUID.randomUUID.toString.take(8)}")
      // keep = NOT match; one rewrite job per touched day over only its
      // touched files, preserving their file count (no re-layout here —
      // compact() is the re-layout op)
      spark.read.parquet(entries.map(e => s"$base/${e.path}"): _*)
        .filter(!isMatch)
        .coalesce(entries.length)
        .write.mode("overwrite").parquet(stage.toString)
      val live = new Path(root, s"dt=$day")
      val moved = fs.listStatus(stage)
        .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
        .map { f =>
          val target = new Path(live, f.getPath.getName)
          if (!fs.rename(f.getPath, target))
            throw new java.io.IOException(
              s"VersionedLake: rename ${f.getPath} -> $target failed")
          (f.getPath.getName, f.getLen)
        }
      fs.delete(stage, true): Unit
      val stats = perFileStats(spark,
        moved.map(m => s"$base/dt=$day/${m._1}"), statsCols)
      val oldRows = entries.map(_.rows).sum
      val hit = entries.map(e => matches(e.path)).sum
      require(stats.values.map(_._1).sum == oldRows - hit,
        s"VersionedLake: delete on $day rewrote ${stats.values.map(_._1).sum}" +
          s" rows, expected ${oldRows - hit}")
      moved.foreach { case (name, len) =>
        val (n, ranges) = stats.getOrElse(s"dt=$day/$name",
          (0L, Map.empty[String, (String, String)]))
        added += FileEntry(s"dt=$day/$name", day, n, len, ranges)
      }
    }
    val dead = touched.map(_.path).toSet
    val fresh = added.result()
    commit(spark, root, snap.schema,
      prev => prev.filterNot(f => dead(f.path)) ++ fresh, op = "delete")
  }

  /** ADOPT an existing [[Partitioned]]-layout day tree into a commit log,
    * IN PLACE: the data files stay exactly where they are (any reader of
    * the raw tree keeps working), and one `import` commit publishes them
    * as version 1 — from then on every [[VersionedLake]] op (snapshot
    * reads, clustered compaction, band skipping, deletes, upserts,
    * streaming batches) applies. This is the migration path between the
    * two lake flavors; cost is one metadata listing plus one per-file
    * stats job over the tree (the one-time census an adoption cannot
    * avoid — row counts are what make later rewrites verifiable).
    * Streaming-sink trees import cleanly: `bN-` stamped files are plain
    * data here, and the `_graft_lake_batches` markers are ignored like
    * any `_` path.
    */
  def importTree(spark: SparkSession, path: String,
      statsCols: Seq[String] = Nil): Long = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    require(latestVersion(spark, path).isEmpty,
      s"VersionedLake: $path already has a commit log")
    val base = fs.makeQualified(root).toString
    val found = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("dt="))
      .flatMap { dayDir =>
        val day = dayDir.getPath.getName.stripPrefix("dt=")
        fs.listStatus(dayDir.getPath)
          .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
            !s.getPath.getName.startsWith("."))
          .map(f => (day, f.getPath.getName, f.getLen))
      }.toSeq
    require(found.nonEmpty, s"VersionedLake: no dt= data under $path")
    val stats = perFileStats(spark,
      found.map { case (day, name, _) => s"$base/dt=$day/$name" }, statsCols)
    val entries = found.map { case (day, name, len) =>
      val (rows, ranges) = stats.getOrElse(s"dt=$day/$name",
        (0L, Map.empty[String, (String, String)]))
      FileEntry(s"dt=$day/$name", day, rows, len, ranges)
    }
    val schema = spark.read.option("basePath", base).parquet(base)
      .drop("dt").schema
    commit(spark, root, schema, _ => entries, op = "import")
  }

  /** ROLLBACK: publish an old version's exact file list as the new head
    * — a pure manifest commit (no data moves, O(files) text). The target
    * version's files must still exist, i.e. it must be inside the
    * [[vacuum]] retention window; afterwards the mistake-versions remain
    * time-travelable until retention expires them. The streaming
    * high-water mark is PRESERVED (not rolled back): replayed batch ids
    * must stay no-ops even when their data was intentionally restored
    * away, otherwise a restart would re-append what restore removed.
    */
  def restore(spark: SparkSession, path: String, version: Long): Long = {
    val root = new Path(path)
    val target = snapshot(spark, path, Some(version))
    commit(spark, root, target.schema, _ => target.files,
      op = s"restore-v$version")
  }

  /** UPSERT (the MERGE-by-key analog, last-write-wins): every lake row
    * whose `key` appears in `updates` is replaced by the update row, and
    * update rows with unseen keys are appended — one atomic commit.
    * Copy-on-write like [[deleteWhere]]: one semi-join match scan finds
    * the files holding stale versions of updated keys (`updates`' key
    * set broadcasts when small — pass compact update batches, the CDC
    * shape), each touched day rewrites only its touched files with the
    * stale rows anti-joined out, and the whole `updates` frame lands via
    * the append path (so it carries stats for `statsCols`). Older
    * versions keep the pre-image — the CDC audit trail.
    *
    * `updates` must be key-unique (the caller's CDC compaction step —
    * enforce upstream with a window-dedup when feeds can double-emit).
    */
  def upsert(updates: DataFrame, path: String, key: String,
      tsCol: String = "ts", statsCols: Seq[String] = Nil): Long = {
    val spark = updates.sparkSession
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val base = fs.makeQualified(root).toString
    val snap = snapshot(spark, path, None)
    // pin: the key frame drives a match scan and the rewrites; an
    // unpinned lineage would re-execute the caller's feed per action
    val pinned = updates.localCheckpoint()
    try {
      val keys = pinned.select(col(key)).distinct()
      // one job: which files hold a stale version of an updated key
      // (metadata columns resolve only on the scan itself — project the
      // file path BEFORE the join)
      val matches = spark.read
        .parquet(snap.files.map(e => s"$base/${e.path}"): _*)
        .select(col("_metadata.file_path").as("f"), col(key))
        .join(broadcast(keys), Seq(key), "left_semi")
        .groupBy(col("f")).count().collect()
        .map(r => r.getString(0).split('/').takeRight(2).mkString("/"))
        .toSet
      val touched = snap.files.filter(e => matches(e.path))
      val added = Seq.newBuilder[FileEntry]
      touched.groupBy(_.dt).toSeq.sortBy(_._1).foreach { case (day, entries) =>
        val dayStats = entries.flatMap(_.stats.keys).distinct
        val stage = new Path(root,
          s".vstage_upsert_${day}_${java.util.UUID.randomUUID.toString.take(8)}")
        spark.read.parquet(entries.map(e => s"$base/${e.path}"): _*)
          .join(broadcast(keys), Seq(key), "left_anti") // drop stale rows
          .coalesce(entries.length)
          .write.mode("overwrite").parquet(stage.toString)
        val live = new Path(root, s"dt=$day")
        val moved = fs.listStatus(stage)
          .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
          .map { f =>
            val target = new Path(live, f.getPath.getName)
            if (!fs.rename(f.getPath, target))
              throw new java.io.IOException(
                s"VersionedLake: rename ${f.getPath} -> $target failed")
            (f.getPath.getName, f.getLen)
          }
        fs.delete(stage, true): Unit
        val stats = perFileStats(spark,
          moved.map(m => s"$base/dt=$day/${m._1}"), dayStats)
        moved.foreach { case (name, len) =>
          val (n, ranges) = stats.getOrElse(s"dt=$day/$name",
            (0L, Map.empty[String, (String, String)]))
          added += FileEntry(s"dt=$day/$name", day, n, len, ranges)
        }
      }
      val dead = touched.map(_.path).toSet
      val fresh = added.result()
      // the update batch's files move in manifest-less (invisible), then
      // ONE commit publishes substitutions + additions together: no
      // reader — current or time-traveling — ever sees a snapshot with
      // both row versions of an updated key
      val newEntries = stageAndMove(pinned, path, tsCol, statsCols)
      commit(spark, root, snap.schema,
        prev => prev.filterNot(f => dead(f.path)) ++ fresh ++ newEntries,
        op = "upsert")
    } finally org.apache.spark.sql.GraftBridge.unpersistCheckpoint(pinned)
  }

  /** Reclaim storage: delete data files referenced by NO retained
    * version (the latest `retainVersions` manifests), drop the expired
    * manifests, and sweep orphaned stage dirs. This is the op that
    * bounds time travel — versions older than the retention window stop
    * being readable, which is the documented price of reclaiming their
    * exclusive files. Run it OUTSIDE any reader still pinned to an
    * expiring version (the same maintenance-window contract as any
    * retention system).
    */
  def vacuum(spark: SparkSession, path: String,
      retainVersions: Int = 1): Unit = {
    require(retainVersions >= 1, "must retain at least the latest version")
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val dir = new Path(root, CommitDir)
    if (!fs.exists(dir)) return
    val versions = fs.listStatus(dir).toSeq.collect {
      case s if s.isFile =>
        s.getPath.getName match {
          case VName(n) => Some(n.toLong)
          case _        => None
        }
    }.flatten.sorted
    if (versions.isEmpty) return
    val retained = versions.takeRight(retainVersions)
    val live: Set[String] = retained.flatMap(v =>
      snapshot(spark, path, Some(v)).files.map(_.path)).toSet
    // sweep data files no retained manifest references
    fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("dt="))
      .foreach { dayDir =>
        val day = dayDir.getPath.getName
        fs.listStatus(dayDir.getPath)
          .filter(s => s.isFile && !s.getPath.getName.startsWith(".") &&
            !s.getPath.getName.startsWith("_"))
          .foreach { f =>
            if (!live(s"$day/${f.getPath.getName}"))
              fs.delete(f.getPath, false): Unit
          }
        if (fs.listStatus(dayDir.getPath).isEmpty)
          fs.delete(dayDir.getPath, false): Unit // day emptied by retention
      }
    // expired manifests + crashed writers' stage dirs
    versions.dropRight(retainVersions)
      .foreach(v => fs.delete(commitPath(root, v), false): Unit)
    fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(".vstage_"))
      .foreach(s => fs.delete(s.getPath, true): Unit)
  }
}
