package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.kv.Store

/** Engine introspection — the Spark analog of the reference's status
  * service (`distribution/local/status.js:76-118` node facts,
  * `distribution/all/status.js:54-100` group aggregation).
  *
  * Mapping:
  *  - node identity (sid/nid/ip/port) → executor id/host/port from the
  *    public `statusTracker` API;
  *  - `heapTotal`/`heapUsed`        → executor storage-memory totals plus
  *    the driver JVM heap;
  *  - `counts` (keys on this node)   → per-gid key counts of a [[Store]];
  *  - `all.status.get`'s "numeric values are summed over the group"  →
  *    [[aggregate]], one row of summed numerics over the executor rows.
  *
  * Everything is exposed as DataFrames so status joins/filters compose
  * with the rest of the engine (the reference returns plain maps).
  */
object Status {

  /** One row per executor (local.status.get over the whole group): host,
    * port, running tasks, cached blocks, storage memory used/total — plus
    * ONE separate "driver" row carrying the driver JVM's heap
    * (heapTotal/heapUsed, the analog of the reference's process-level
    * heap fields). The heap columns are null on executor rows: each
    * process's memory appears exactly once, so [[aggregate]]'s group sum
    * counts it once — the reference sums DISTINCT per-node heaps
    * (local/status.js:76-118), never one process N times.
    */
  def executors(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rt = Runtime.getRuntime
    val heapTotal = rt.totalMemory()
    val heapUsed = rt.totalMemory() - rt.freeMemory()
    val execRows = spark.sparkContext.statusTracker.getExecutorInfos.toSeq
      .map { e =>
        (e.host(), e.port(), e.numRunningTasks(), e.cacheSize(),
          e.usedOnHeapStorageMemory() + e.usedOffHeapStorageMemory(),
          e.totalOnHeapStorageMemory() + e.totalOffHeapStorageMemory(),
          None: Option[Long], None: Option[Long])
      }
    val driverRow =
      ("driver", -1, 0, 0L, 0L, 0L, Some(heapTotal), Some(heapUsed))
    (execRows :+ driverRow)
      .toDF("host", "port", "running_tasks", "cached_bytes",
        "storage_used", "storage_total", "heap_total", "heap_used")
  }

  /** `counts` analog: number of stored keys per gid of a [[Store]]
    * (local/status.js reports the node's key count; here the store is
    * the key-holding surface).
    */
  def counts(spark: SparkSession, store: Store, gids: Seq[String]): DataFrame =
    gids.map { g =>
      store.keys(g).agg(count(lit(1)).as("n_keys"))
        .select(lit(g).as("gid"), col("n_keys"))
    }.reduceOption(_ unionAll _).getOrElse {
      // no gids: the schema-bearing empty frame, not empty.reduceLeft
      import spark.implicits._
      Seq.empty[(String, Long)].toDF("gid", "n_keys")
    }

  /** `all.status.get` aggregation: numeric columns summed across the
    * group (all/status.js:54-100 sums numeric keys like heap sizes).
    */
  def aggregate(status: DataFrame): DataFrame = {
    val numerics = status.schema.fields.collect {
      case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] =>
        sum(col(f.name)).as(f.name)
    }
    status.agg(numerics.head, numerics.tail: _*)
  }
}
