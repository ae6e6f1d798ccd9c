package graft

import org.apache.spark.sql.functions._
import graft.kv.{Mem, Store}

/** KV layer semantics from the reference (mem/store CRUD,
  * test/local.test.js:426-711; sharded ops test/all.test.js:524-847).
  */
class KVSpec extends SparkSessionSpec {
  import spark.implicits._

  def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-kv").toString

  test("store put/get/keys/del round-trip") {
    val store = new Store(spark, freshRoot())
    val df = Seq((1L, "jcarlin"), (2L, "dvass")).toDF("id", "name")
    store.put(df, "users", keyCol = Some("id"))
    assert(store.keys("users").as[String].collect().toSet === Set("1", "2"))
    val got = store.get("users", "1").select("value").as[String].head()
    assert(got.contains("jcarlin"))
    store.del("users", "1")
    assert(store.keys("users").as[String].collect().toSet === Set("2"))
  }

  test("content-addressed default key (getID semantics, id.js:72-78)") {
    val store = new Store(spark, freshRoot())
    val df = Seq(("x", 1), ("y", 2)).toDF("a", "b")
    store.put(df, "g")
    val keys = store.keys("g").as[String].collect()
    assert(keys.length === 2)
    assert(keys.forall(_.matches("[0-9a-f]{64}"))) // sha-256 hex
    // same content ⇒ same key ⇒ idempotent put
    store.put(df, "g")
    assert(store.keys("g").count() === 2)
  }

  test("duplicate key: last write wins (all.student.test.js:230-293)") {
    val store = new Store(spark, freshRoot())
    store.put(Seq((1L, "old")).toDF("id", "v"), "d", Some("id"))
    store.put(Seq((1L, "new")).toDF("id", "v"), "d", Some("id"))
    assert(store.scan("d").count() === 1)
    assert(store.get("d", "1").select("value").as[String].head().contains("new"))
  }

  test("reconf rewrites into n hash buckets (all/store.js:217-285)") {
    val store = new Store(spark, freshRoot())
    store.put((1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v"), "r", Some("id"))
    store.reconf("r", 4)
    assert(store.scan("r").count() === 100)
    assert(store.get("r", "42").count() === 1)
  }

  test("mem put/get/del with cache") {
    val mem = new Mem
    mem.put(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "m", Some("id"))
    assert(mem.keys("m").as[String].collect().toSet === Set("1", "2"))
    mem.del("m", "2")
    assert(mem.scan("m").count() === 1)
  }
}
