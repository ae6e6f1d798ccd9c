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
  *    serving a gap.
  *
  * The V1 `Source` API is deliberate: `getBatch` composes the batch as a
  * driver-side plan over exactly the versions' files (the same
  * [[VersionedLake.scanEntries]] every batch read uses), which a DSv2
  * `MicroBatchStream` would force into hand-rolled per-partition parquet
  * readers. Spark's own FileStreamSource ships on the same API.
  */
class LakeSource(spark: SparkSession, path: String, ignoreChanges: Boolean)
    extends Source {

  private val root = new org.apache.hadoop.fs.Path(path)
  private val fs = VersionedLake.fsOf(spark, root)
  private val base = fs.makeQualified(root).toString
  private val dataSchema: StructType =
    VersionedLake.snapshot(spark, path, None).schema

  override val schema: StructType = dataSchema.add("dt", "string")

  override def getOffset: Option[Offset] =
    VersionedLake.latestVersion(spark, path).map(v => LongOffset(v))

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
    val entries = start match {
      // initial batch: the whole snapshot at endV (tombstones applied) —
      // NOT the union of historical adds, which would double-count every
      // compaction rewrite
      case None => VersionedLake.snapshot(spark, path, Some(endV)).files
      case Some(s) => ((ver(s) + 1L) to endV).flatMap(addsOf)
    }
    val batch =
      if (entries.isEmpty)
        org.apache.spark.sql.GraftBridge.emptyStreamingFrame(spark, schema)
      else org.apache.spark.sql.GraftBridge.asStreamingFrame(
        VersionedLake.scanEntries(spark, base, dataSchema, entries))
    batch
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

  override def sourceSchema(ctx: SQLContext, userSchema: Option[StructType],
      providerName: String, params: Map[String, String])
      : (String, StructType) = {
    val snap = VersionedLake.snapshot(ctx.sparkSession, pathOf(params), None)
    // the lake IS the schema authority: a user override could only
    // diverge from what the manifests will serve
    (shortName(), snap.schema.add("dt", "string"))
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
      userSchema: Option[StructType], providerName: String,
      params: Map[String, String]): Source =
    new LakeSource(ctx.sparkSession, pathOf(params),
      params.get("ignoreChanges").exists(_.trim.equalsIgnoreCase("true")))
}
