package graft

import org.apache.spark.sql.functions._

import graft.ops.Snapshot

/** Snapshot CDC diff: hand-built old/new snapshots with every op class,
  * plus the no-change and multi-column-identity contracts.
  */
class SnapshotSpec extends SparkSessionSpec {
  import spark.implicits._

  private def snap(rows: (Long, String, String)*) =
    rows.toDF("id", "text", "lang")

  test("diff emits exactly the insert/delete/update delta") {
    val old = snap((1L, "a", "en"), (2L, "b", "en"), (3L, "c", "de"),
      (4L, "d", "en"))
    val neu = snap((2L, "b", "en"),        // unchanged -> no row
      (3L, "c CHANGED", "de"),             // text update
      (4L, "d", "fr"),                     // non-text column update
      (5L, "e", "en"))                     // insert; 1 deleted
    val got = Snapshot.diff(old, neu, "id", Seq("text", "lang"))
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "delete", 3L -> "update", 4L -> "update",
      5L -> "insert"))
  }

  test("identical snapshots diff to zero rows") {
    val s = snap((1L, "a", "en"), (2L, "b", "de"))
    assert(Snapshot.diff(s, s, "id", Seq("text", "lang")).count() === 0)
  }

  test("separator keeps adjacent-column content distinct") {
    // ("ab","c") vs ("a","bc") concatenate identically without a
    // separator; the digest must still see them as different content
    val old = snap((1L, "ab", "c"))
    val neu = snap((1L, "a", "bc"))
    val got = Snapshot.diff(old, neu, "id", Seq("text", "lang"))
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "update"))
  }

  test("delta is O(changes): plan ships digests, not payloads") {
    // the join inputs project to (key, 32-char md5) regardless of how
    // wide the compared columns are — assert the optimized plan reads
    // no raw compare column past the digest projection
    val old = snap((1L, "x" * 1000, "en"), (2L, "y", "en"))
    val neu = snap((1L, "x" * 1000, "en"), (2L, "z", "en"))
    val df = Snapshot.diff(old, neu, "id", Seq("text", "lang"))
    val joinSchemas = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.flatMap(_.children.map(_.output.map(_.name).toSeq))
    assert(joinSchemas.nonEmpty)
    joinSchemas.foreach { fields =>
      assert(!fields.contains("text") && !fields.contains("lang"),
        s"join input still carries payload columns: $fields")
    }
  }

  test("applyChangelog: upsert, delete, last-write-wins conflict, passthrough") {
    import spark.implicits._
    val base = snap((1L, "a", "en"), (2L, "b", "en"), (3L, "c", "de"))
    val ch = Seq(
      (2L, "b2", "en", "U", 1L),  // update
      (3L, null.asInstanceOf[String], null.asInstanceOf[String], "D", 1L), // delete
      (4L, "d", "fr", "U", 1L),   // insert
      (5L, "e", "en", "U", 1L),   // insert...
      (5L, null.asInstanceOf[String], null.asInstanceOf[String], "D", 2L)) // ...then deleted: D wins
      .toDF("id", "text", "lang", "op", "seq")
    val got = Snapshot.applyChangelog(base, ch, "id")
      .as[(Long, String, String)].collect().toSet
    assert(got === Set((1L, "a", "en"), (2L, "b2", "en"), (4L, "d", "fr")))
  }

  test("applyChangelog then diff round-trip: the delta reproduces the changelog's effect") {
    val base = snap((1L, "a", "en"), (2L, "b", "en"), (3L, "c", "de"))
    import spark.implicits._
    val ch = Seq((2L, "b2", "en", "U", 1L),
      (3L, null.asInstanceOf[String], null.asInstanceOf[String], "D", 1L))
      .toDF("id", "text", "lang", "op", "seq")
    val merged = Snapshot.applyChangelog(base, ch, "id")
    val delta = Snapshot.diff(base, merged, "id", Seq("text", "lang"))
      .as[(Long, String)].collect().toMap
    assert(delta === Map(2L -> "update", 3L -> "delete"))
  }
}
