package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.kv.{Mem, Store}
import graft.streaming.KVSink

/** The mem-vs-store duality for streaming sinks (reference README.md:20):
  * a streaming aggregate written through the KV layer must equal the
  * batch aggregate over the same data — after EVERY prefix of batches,
  * since update-mode upserts overwrite each key as it changes.
  */
class KVSinkSpec extends SparkSessionSpec {
  import spark.implicits._

  private def t(min: Int) = new Timestamp(min * 60000L)

  private val valueSchema = StructType.fromDDL("user_id LONG, n LONG, sum_v DOUBLE")

  private def runningAgg(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"))

  private def storedAgg(scan: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    scan.select(from_json(col("value"), valueSchema).as("r"))
      .select("r.user_id", "r.n", "r.sum_v")
      .as[(Long, Long, Double)].collect().toSet

  private def batchAgg(rows: Seq[(Long, Timestamp, Double)]): Set[(Long, Long, Double)] =
    runningAgg(rows.toDF("user_id", "ts", "value"))
      .as[(Long, Long, Double)].collect().toSet

  test("streaming aggregate through Store == batch aggregate, per batch prefix") {
    val root = java.nio.file.Files.createTempDirectory("graft-kvsink").toString
    val store = new Store(spark, root, defaultBuckets = 4)
    val mem = MemoryStream[(Long, Timestamp, Double)](spark)
    val q = KVSink.toStore(
      runningAgg(mem.toDF().toDF("user_id", "ts", "value")),
      store, "agg", keyCol = "user_id",
      checkpointDir = s"$root/__ckpt")
    try {
      val batch1 = Seq((1L, t(0), 10.0), (1L, t(1), 5.0), (2L, t(2), 7.0))
      mem.addData(batch1)
      q.processAllAvailable()
      assert(storedAgg(store.scan("agg")) === batchAgg(batch1))
      // second batch updates user 1 and introduces user 3: the upsert
      // must overwrite 1's row (last write wins) and keep 2's untouched
      val batch2 = Seq((1L, t(3), 1.0), (3L, t(4), 2.0))
      mem.addData(batch2)
      q.processAllAvailable()
      assert(storedAgg(store.scan("agg")) === batchAgg(batch1 ++ batch2))
    } finally q.stop()
  }

  test("streaming aggregate through Mem == batch aggregate") {
    val root = java.nio.file.Files.createTempDirectory("graft-kvsink-mem").toString
    val kvMem = new Mem
    val mem = MemoryStream[(Long, Timestamp, Double)](spark)
    val q = KVSink.toMem(
      runningAgg(mem.toDF().toDF("user_id", "ts", "value")),
      kvMem, "agg", keyCol = "user_id",
      checkpointDir = s"$root/__ckpt")
    try {
      val batch1 = Seq((1L, t(0), 10.0), (2L, t(1), 3.0))
      val batch2 = Seq((2L, t(2), 4.0))
      mem.addData(batch1)
      q.processAllAvailable()
      mem.addData(batch2)
      q.processAllAvailable()
      assert(storedAgg(kvMem.scan("agg")) === batchAgg(batch1 ++ batch2))
    } finally q.stop()
  }
}
