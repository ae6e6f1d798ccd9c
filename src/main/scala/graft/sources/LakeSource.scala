package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** STREAMING SOURCE over a [[VersionedLake]] commit log — the missing
  * half of lake→lake pipelines (the sink has existed since r10; until
  * now a downstream stage had to poll with manual version bookkeeping).
  * The pattern is Delta's streaming source: the OFFSET IS THE COMMIT
  * VERSION, checkpointed by Structured Streaming itself, so restarts
  * resume from the exact version high-water mark and no version is ever
  * double-read — exactly-once composes end-to-end when the downstream
  * sink is [[VersionedLake.sink]] (idempotent batch commits).
  *
  *  - first micro-batch = the full snapshot at the stream-start version
  *    (Delta's "initial snapshot"), dv tombstones anti-applied;
  *  - every later micro-batch = the ADD entries of the next committed
  *    version(s): one manifest read per version, one scan over just the
  *    new files — O(batch), never O(lake);
  *  - a pure compaction commits rewrites, not rows — its adds are
  *    SKIPPED (nothing is double-delivered); [[VersionedLake.evolveSchema]]
  *    adds no files and the source schema is pinned at start (by-name
  *    parquet resolution keeps newer wide files readable);
  *  - a delete/upsert/restore version CHANGES history instead of
  *    appending — the stream FAILS LOUDLY by default (the Delta
  *    contract). `ignoreChanges = true` opts into skip-the-rewrites
  *    semantics: an upsert's fresh images still stream (its entries are
  *    `src == "append"`), rewritten files and tombstone re-publishes do
  *    not — downstream must tolerate updated keys arriving again;
  *  - a version vacuumed past retention fails the batch with a loud
  *    error naming the cure (fresh checkpoint) instead of silently
  *    serving a gap;
  *  - CDC MODE (`cdc = true`): the stream is the CHANGE FEED itself —
  *    the initial batch is the snapshot tagged `insert`, every later
  *    batch is [[VersionedLake.changes]] between the offsets, so deletes
  *    arrive as `delete` rows and upserts as pre-image + new-image
  *    pairs; history rewrites are DATA here, never failures (Delta's
  *    readChangeFeed);
  *  - `maxVersionsPerBatch` caps how many commit-log versions one
  *    micro-batch spans past the committed high-water mark — a cold
  *    start against a 10⁴-version backlog drains in bounded batches
  *    (Delta's maxFilesPerTrigger analog; best-effort across restarts).
  *
  * The V1 `Source` API is deliberate: `getBatch` composes the batch as a
  * driver-side plan over exactly the versions' files (the same
  * [[VersionedLake.scanEntries]] every batch read uses), which a DSv2
  * `MicroBatchStream` would force into hand-rolled per-partition parquet
  * readers. Spark's own FileStreamSource ships on the same API.
  */
class LakeSource(spark: SparkSession, path: String, ignoreChanges: Boolean,
    cdc: Boolean = false, maxVersionsPerBatch: Long = 0L,
    startingVersion: Long = 0L) extends Source {

  private val root = new org.apache.hadoop.fs.Path(path)
  private val fs = VersionedLake.fsOf(spark, root)
  private val base = fs.makeQualified(root).toString
  private val dataSchema: StructType =
    VersionedLake.snapshot(spark, path, None).schema

  override val schema: StructType = {
    val s = dataSchema.add("dt", "string")
    if (cdc) s.add("_change_type", "string") else s
  }

  // end version of the last batch this source PLANNED (getBatch runs
  // before the engine polls getOffset again, so this is the correct
  // rate-limit anchor — the engine's commit() callback lands too late
  // and anchoring on it makes the engine believe it caught up early).
  // Best-effort across restarts: the recovered batch replays uncapped,
  // like Delta's maxFilesPerTrigger.
  @volatile private var plannedV: Option[Long] = None

  override def getOffset: Option[Offset] =
    VersionedLake.latestVersion(spark, path).map { latest =>
      val capped = (maxVersionsPerBatch, plannedV) match {
        // cap how far one micro-batch reaches past the last planned
        // batch: a backlog of 10⁴ versions drains in bounded batches
        // instead of one giant catch-up plan
        case (n, Some(p)) if n > 0L => math.min(latest, p + n)
        case _ => latest
      }
      LongOffset(capped)
    }

  /** Adds a version contributes to the stream (empty for pure rewrites;
    * loud for history rewrites unless `ignoreChanges`).
    */
  private def addsOf(v: Long): Seq[VersionedLake.FileEntry] = {
    val p = VersionedLake.commitPath(root, v)
    val m =
      try VersionedLake.readManifestFile(fs, p)
      catch {
        case e: java.io.FileNotFoundException =>
          sys.error(s"graft-lake source: version $v of $path was vacuumed " +
            "past retention before the stream read it — restart from a " +
            s"fresh checkpoint (underlying: ${e.getMessage})")
      }
    m.op match {
      case "append" | "append-batch" | "import" => m.adds
      case "compact" | "evolve-schema" => Nil // rewrite/metadata: no rows
      case op if ignoreChanges =>
        // upsert's NEW images land via the append path (src "append");
        // its rewrites and delete/restore substitutions are skipped
        m.adds.filter(_.src == "append")
      case op => sys.error(s"graft-lake source: version $v of $path is a " +
        s"'$op' commit — the stream only tails appends. Set " +
        "ignoreChanges=true to skip rewrites (updated keys may re-stream), " +
        "or start a fresh checkpoint from the current snapshot.")
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    def ver(o: Offset): Long = o.json.trim.toLong
    val endV = ver(end)
    plannedV = Some(endV)
    // startingVersion (Delta parity): the first batch tails from that
    // version onward INSTEAD of serving the initial snapshot — the
    // "resume a pipeline without replaying the corpus" knob
    val effStart: Option[Long] = start.map(ver).orElse(
      if (startingVersion > 0L) Some(startingVersion - 1L) else None)
    val batch =
      if (cdc) getCdcBatch(effStart, endV)
      else {
        val entries = effStart match {
          // initial batch: the whole snapshot at endV (tombstones
          // applied) — NOT the union of historical adds, which would
          // double-count every compaction rewrite
          case None => VersionedLake.snapshot(spark, path, Some(endV)).files
          case Some(s) => ((s + 1L) to endV).flatMap(addsOf)
        }
        if (entries.isEmpty) null
        else VersionedLake.scanEntries(spark, base, dataSchema, entries)
      }
    if (batch == null)
      org.apache.spark.sql.GraftBridge.emptyStreamingFrame(spark, schema)
    else org.apache.spark.sql.GraftBridge.asStreamingFrame(
      batch.select(schema.fieldNames.map(
        org.apache.spark.sql.functions.col).toSeq: _*))
  }

  /** CDC mode: the micro-batch IS the change feed. Initial batch = the
    * snapshot tagged `insert`; every later batch = [[VersionedLake.changes]]
    * between the offsets — deletes surface as `delete` rows, an upsert
    * as pre-image `delete` + new-image `insert`, compactions cancel.
    * History rewrites are DATA here, not a failure: CDC consumers exist
    * precisely to see them.
    */
  private def getCdcBatch(startV: Option[Long], endV: Long): DataFrame = {
    import org.apache.spark.sql.functions.lit
    startV match {
      case None =>
        val files = VersionedLake.snapshot(spark, path, Some(endV)).files
        if (files.isEmpty) null
        else VersionedLake.scanEntries(spark, base, dataSchema, files)
          .withColumn("_change_type", lit("insert"))
      case Some(s) if s >= endV => null // startingVersion beyond the head
      case Some(s) if s < 1L => sys.error("graft-lake source (cdc): " +
        "startingVersion must be >= 2 in cdc mode (the predecessor " +
        "version must exist to diff against); omit it to start from the " +
        "initial snapshot")
      case Some(s) =>
        try VersionedLake.changes(spark, path, s, Some(endV))
        catch {
          case e: RuntimeException
              if e.getMessage != null && e.getMessage.contains("vacuum") =>
            sys.error(s"graft-lake source (cdc): versions ($s, $endV] of " +
              s"$path were vacuumed past retention before the stream read " +
              s"them — restart from a fresh checkpoint (${e.getMessage})")
        }
    }
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** `spark.readStream.format("graft.sources.LakeSourceProvider")` (or the
  * short name `graft-lake`) with `option("path", lakeRoot)`; see
  * [[VersionedLake.source]] for the ergonomic entry point.
  */
class LakeSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-lake"

  private def pathOf(params: Map[String, String]): String =
    params.getOrElse("path",
      sys.error("graft-lake source: option 'path' is required"))

  private def flag(params: Map[String, String], k: String): Boolean =
    params.get(k).exists(_.trim.equalsIgnoreCase("true"))

  override def sourceSchema(ctx: SQLContext, userSchema: Option[StructType],
      providerName: String, params: Map[String, String])
      : (String, StructType) = {
    val snap = VersionedLake.snapshot(ctx.sparkSession, pathOf(params), None)
    // the lake IS the schema authority: a user override could only
    // diverge from what the manifests will serve
    val s = snap.schema.add("dt", "string")
    (shortName(), if (flag(params, "cdc")) s.add("_change_type", "string") else s)
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
      userSchema: Option[StructType], providerName: String,
      params: Map[String, String]): Source =
    new LakeSource(ctx.sparkSession, pathOf(params),
      ignoreChanges = flag(params, "ignoreChanges"),
      cdc = flag(params, "cdc"),
      maxVersionsPerBatch =
        params.get("maxVersionsPerBatch").map(_.trim.toLong).getOrElse(0L),
      startingVersion =
        params.get("startingVersion").map(_.trim.toLong).getOrElse(0L))
}
