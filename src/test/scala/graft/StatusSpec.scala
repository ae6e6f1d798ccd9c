package graft

import org.apache.spark.sql.functions._

import graft.kv.Store
import graft.ops.Status

/** Status introspection parity (reference local/status.js:76-118 facts,
  * all/status.js:54-100 numeric-sum aggregation).
  */
class StatusSpec extends SparkSessionSpec {
  import spark.implicits._

  test("executors reports live node facts; driver heap on its own row only") {
    val st = Status.executors(spark)
    val rows = st.collect()
    // at least one executor row + the driver row
    assert(rows.length >= 2)
    assert(st.filter(col("host") =!= "driver" && col("storage_total") > 0)
      .count() === rows.length - 1L)
    // each process's heap appears exactly once: only the driver row
    // carries it (executor rows are null) — aggregate() must not
    // multiple-count one JVM's memory
    assert(st.filter(col("heap_total").isNotNull).count() === 1L)
    assert(st.filter(col("host") === "driver" &&
      col("heap_total") > 0 && col("heap_used") > 0).count() === 1L)
  }

  test("aggregate counts the driver heap once over a multi-executor group") {
    val st = Status.executors(spark)
    val driverHeap = st.filter(col("host") === "driver")
      .select("heap_total").as[Long].head()
    val agg = Status.aggregate(st).collect().head
    // sum over ≥2 rows where only one carries heap: nulls don't inflate it
    assert(agg.getLong(agg.fieldIndex("heap_total")) === driverHeap)
  }

  test("counts of zero gids is an empty frame, not empty.reduceLeft") {
    val root = java.nio.file.Files.createTempDirectory("graft-status0").toString
    val store = new Store(spark, root)
    val got = Status.counts(spark, store, Seq.empty)
    assert(got.columns.toSeq === Seq("gid", "n_keys"))
    assert(got.count() === 0L)
  }

  test("counts reports per-gid key counts of a store") {
    val root = java.nio.file.Files.createTempDirectory("graft-status").toString
    val store = new Store(spark, root)
    store.put(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), "g1", Some("id"))
    store.put(Seq((1L, "x")).toDF("id", "v"), "g2", Some("id"))
    val got = Status.counts(spark, store, Seq("g1", "g2"))
      .as[(String, Long)].collect().toMap
    assert(got === Map("g1" -> 3L, "g2" -> 1L))
  }

  test("aggregate sums numeric columns across the group (all.status.get)") {
    val status = Seq(("a", 7070, 100L, 40L), ("b", 7071, 200L, 60L))
      .toDF("host", "port", "heap_total", "heap_used")
    val agg = Status.aggregate(status).collect().head
    // numeric keys summed — including port, exactly like the reference's
    // "every numeric value is summed" rule (all/status.js:54-100)
    assert(agg.getLong(agg.fieldIndex("heap_total")) === 300L)
    assert(agg.getLong(agg.fieldIndex("heap_used")) === 100L)
    assert(agg.getLong(agg.fieldIndex("port")) === 14141L)
  }
}
