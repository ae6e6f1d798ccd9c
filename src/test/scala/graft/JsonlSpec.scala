package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.Engine.table
import graft.sources.Jsonl

class JsonlSpec extends SparkSessionSpec {

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"jsonl_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath + "/out"
  }

  test("documents round-trip JSONL bit-exactly (text with spaces/newlines escapes)") {
    val docs = table(spark, sfDir, "documents")
    val path = tmp("docs")
    Jsonl.write(docs, path)
    val back = Jsonl.read(spark, path, docs.schema)
    assert(back.schema === docs.schema)
    assert(back.collect().map(_.toSeq).toSet ===
      docs.collect().map(_.toSeq).toSet)
  }

  test("events round-trip JSONL: timestamps survive as ISO-8601") {
    val ev = table(spark, sfDir, "events")
    val path = tmp("events")
    Jsonl.write(ev, path)
    val back = Jsonl.read(spark, path, ev.schema)
    assert(back.schema === ev.schema)
    assert(back.count() === ev.count())
    val a = ev.agg(max(col("ts")), min(col("ts")), sum(col("value")))
      .collect()(0).toSeq
    val b = back.agg(max(col("ts")), min(col("ts")), sum(col("value")))
      .collect()(0).toSeq
    assert(a === b)
  }

  test("FAILFAST surfaces dirty lines; PERMISSIVE reads the clean ones") {
    import spark.implicits._
    val path = tmp("dirty")
    Seq("""{"a": 1, "b": "x"}""", """{"a": "NOT_A_NUMBER", "b": "y"}""")
      .toDF("value").coalesce(1).write.mode("overwrite").text(path)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "a LONG, b STRING")
    val permissive = Jsonl.read(spark, path, schema).collect()
    assert(permissive.length === 2) // dirty row kept, bad field nulled
    assert(permissive.count(_.isNullAt(0)) === 1)
    val ff = intercept[org.apache.spark.SparkException] {
      Jsonl.read(spark, path, schema, failFast = true).collect()
    }
    assert(ff.getMessage != null)
  }

  test("schema evolution: an added nullable column reads as null over old shards") {
    // the normal corpus lifecycle event: v2 of the pipeline adds a
    // column; old shards must keep reading under the NEW schema with
    // nulls in the new field — by NAME, position-independent (JSON),
    // so the field can sit ANYWHERE in the evolved schema
    val docs = table(spark, sfDir, "documents").limit(50)
    val path = tmp("evolve_add")
    Jsonl.write(docs, path) // old shards: no `quality` field
    val v2 = org.apache.spark.sql.types.StructType(
      docs.schema.fields.patch(1,
        Seq(org.apache.spark.sql.types.StructField("quality",
          org.apache.spark.sql.types.DoubleType, nullable = true)), 0))
    val back = Jsonl.read(spark, path, v2)
    assert(back.schema.fieldNames.toSeq === v2.fieldNames.toSeq)
    assert(back.filter(col("quality").isNotNull).count() === 0)
    // every original column is intact
    assert(back.drop("quality").collect().map(_.toSeq).toSet ===
      docs.collect().map(_.toSeq).toSet)
  }

  test("schema evolution: a removed column reads as a projection over new shards") {
    // the reverse direction: a narrower v1 schema over v2 shards simply
    // projects — extra JSON fields are skipped by name
    val docs = table(spark, sfDir, "documents").limit(50)
    val path = tmp("evolve_rm")
    Jsonl.write(docs, path)
    val narrow = org.apache.spark.sql.types.StructType(
      docs.schema.fields.filter(_.name != "source"))
    val back = Jsonl.read(spark, path, narrow)
    assert(back.schema.fieldNames.toSeq === narrow.fieldNames.toSeq)
    assert(back.collect().map(_.toSeq).toSet ===
      docs.drop("source").collect().map(_.toSeq).toSet)
  }
}
