package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.Engine.table
import graft.kv.Store
import graft.sources.Jsonl
import graft.streaming.{DedupStream, KVSink}

/** End-to-end PRODUCTION ingest topology: JSONL shards arriving in a
  * watched directory → Spark's FILE streaming source (schema-required,
  * the Jsonl contract — no inference pass) → s06-shape content-dedup
  * state → [[KVSink.toStore]]. The 17 s-queries all verify stream==batch
  * over MemoryStream micro-batches; this spec drives the real file
  * source instead — per-micro-batch discovery of newly arrived files,
  * delivered by atomic rename (the only arrival discipline that
  * guarantees a reader never sees a half-written shard).
  */
class FileStreamSpec extends SparkSessionSpec {

  private val docSchema =
    StructType.fromDDL("doc_id LONG, lang STRING, text STRING")
  private val stateSchema = StructType.fromDDL(
    "lang STRING, fp STRING, keeper_id LONG, n_copies LONG")

  /** Parse the Store's JSON values back into the groups-state shape. */
  private def storedGroups(scan: DataFrame): DataFrame =
    scan.select(from_json(col("value"), stateSchema).as("r"))
      .select("r.lang", "r.fp", "r.keeper_id", "r.n_copies")

  test("JSONL shards arriving in a watched dir → dedup state → Store == batch") {
    val root = Files.createTempDirectory("graft-filestream").toString
    val watch = s"$root/incoming"
    Files.createDirectories(Paths.get(watch))
    val store = new Store(spark, s"$root/store", defaultBuckets = 4)

    val docs = table(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .filter(col("doc_id") < 200) // keep micro-batches small and fast
    // shard 1 = the corpus; shard 2 = a planted FULL duplicate under
    // disjoint ids (the d10/s06 discipline) — the second micro-batch
    // must flip every group to n_copies = 2 with the original keeper
    val shard2 = docs.select((col("doc_id") + 1000000000000L).as("doc_id"),
      col("lang"), col("text"))

    /** Write a shard to a staging dir, then atomically rename its part
      * files into the watched dir — the production delivery pattern
      * (the file source lists the dir between micro-batches; a rename
      * is the atomic publish).
      */
    def deliver(df: DataFrame, name: String): Unit = {
      val stage = s"$root/__stage_$name"
      Jsonl.write(df.coalesce(1), stage)
      new java.io.File(stage).listFiles()
        .filter(_.getName.startsWith("part-")).zipWithIndex
        .foreach { case (f, i) =>
          Files.move(f.toPath, Paths.get(watch, s"$name-$i.json"),
            StandardCopyOption.ATOMIC_MOVE)
        }
    }

    // schema REQUIRED on the stream too: an inference pass would read
    // every arrived file twice, and a dirty shard would widen types
    val stream = spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", "1")
      .json(watch)
    val state = DedupStream.groups(stream, "text", "doc_id", "lang")
      .withColumn("k", concat_ws("|", col("lang"), col("fp")))
    val q = KVSink.toStore(state, store, "dedup", keyCol = "k",
      checkpointDir = s"$root/__ckpt")
    try {
      deliver(docs, "shard1")
      q.processAllAvailable()
      val batch1 = DedupStream.groups(docs, "text", "doc_id", "lang")
        .collect().map(_.toSeq).toSet
      assert(storedGroups(store.scan("dedup"))
        .collect().map(_.toSeq).toSet === batch1)

      deliver(shard2, "shard2")
      q.processAllAvailable()
      val both = docs.unionAll(shard2)
      val batch2 = DedupStream.groups(both, "text", "doc_id", "lang")
        .collect().map(_.toSeq).toSet
      val stored2 = storedGroups(store.scan("dedup"))
      assert(stored2.collect().map(_.toSeq).toSet === batch2)

      // the s06 monitoring stats derive from the sink state and equal
      // the batch stats over everything that has arrived
      val derived = stored2.groupBy(col("lang"))
        .agg(sum(col("n_copies")).as("n_docs"),
          count(lit(1)).as("n_distinct"),
          (sum(col("n_copies")) - count(lit(1))).as("n_dups"))
        .collect().map(_.toSeq).toSet
      val batchStats = DedupStream.stats(both, "text", "doc_id", "lang")
        .collect().map(_.toSeq).toSet
      assert(derived === batchStats)

      // every shard-2 doc duplicates a shard-1 doc: keepers stay the
      // original (min id), and dups == distinct per language
      assert(stored2.filter(col("keeper_id") >= 1000000000000L).count() === 0)
      assert(stored2.filter(col("n_copies") =!= 2).count() === 0)
    } finally q.stop()
  }

  test("file source refuses nothing on a quiet dir; late files resume the query") {
    // restartability: a NEW query over the same checkpoint resumes from
    // the recorded file log and only folds files it has not seen
    val root = Files.createTempDirectory("graft-filestream-rs").toString
    val watch = s"$root/incoming"
    Files.createDirectories(Paths.get(watch))
    val store = new Store(spark, s"$root/store", defaultBuckets = 2)
    val docs = table(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .filter(col("doc_id") < 60)

    def start() = {
      val stream = spark.readStream.schema(docSchema).json(watch)
      val state = DedupStream.groups(stream, "text", "doc_id", "lang")
        .withColumn("k", concat_ws("|", col("lang"), col("fp")))
      KVSink.toStore(state, store, "dedup", keyCol = "k",
        checkpointDir = s"$root/__ckpt")
    }
    def deliver(df: DataFrame, name: String): Unit = {
      val stage = s"$root/__stage_$name"
      Jsonl.write(df.coalesce(1), stage)
      new java.io.File(stage).listFiles()
        .filter(_.getName.startsWith("part-")).zipWithIndex
        .foreach { case (f, i) =>
          Files.move(f.toPath, Paths.get(watch, s"$name-$i.json"),
            StandardCopyOption.ATOMIC_MOVE)
        }
    }

    val q1 = start()
    try {
      deliver(docs.filter(col("doc_id") < 30), "a")
      q1.processAllAvailable()
    } finally q1.stop()

    // files that arrive while NO query is running are picked up on restart
    deliver(docs.filter(col("doc_id") >= 30), "b")
    val q2 = start()
    try {
      q2.processAllAvailable()
      val batch = DedupStream.groups(docs, "text", "doc_id", "lang")
        .collect().map(_.toSeq).toSet
      assert(storedGroups(store.scan("dedup"))
        .collect().map(_.toSeq).toSet === batch)
    } finally q2.stop()
  }
}
