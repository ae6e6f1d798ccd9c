package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.Engine.table
import graft.sources.Csv

class CsvSpec extends SparkSessionSpec {

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"csv_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath + "/out"
  }

  test("documents round-trip CSV bit-exactly") {
    val docs = table(spark, sfDir, "documents")
    val path = tmp("docs")
    Csv.write(docs, path)
    val back = Csv.read(spark, path, docs.schema)
    assert(back.schema === docs.schema)
    assert(back.collect().map(_.toSeq).toSet ===
      docs.collect().map(_.toSeq).toSet)
  }

  test("events round-trip CSV: micro timestamps and quoted JSON props survive") {
    val ev = table(spark, sfDir, "events")
    val path = tmp("events")
    Csv.write(ev, path)
    val back = Csv.read(spark, path, ev.schema)
    assert(back.schema === ev.schema)
    assert(back.count() === ev.count())
    // props is a JSON string full of quotes+commas: RFC 4180 quoting must
    // carry it; ts must keep microseconds (default CSV format drops them)
    val a = ev.agg(max(col("ts")), min(col("ts")), sum(col("value")),
      sum(length(col("props")))).collect()(0).toSeq
    val b = back.agg(max(col("ts")), min(col("ts")), sum(col("value")),
      sum(length(col("props")))).collect()(0).toSeq
    assert(a === b)
  }

  test("TSV delimiter variant round-trips") {
    val docs = table(spark, sfDir, "documents")
    val path = tmp("tsv")
    Csv.write(docs, path, delimiter = Csv.Tab)
    val back = Csv.read(spark, path, docs.schema, delimiter = Csv.Tab)
    assert(back.collect().map(_.toSeq).toSet ===
      docs.collect().map(_.toSeq).toSet)
  }

  test("FAILFAST surfaces dirty lines; PERMISSIVE nulls the bad fields") {
    import spark.implicits._
    val path = tmp("dirty")
    Seq("a,b", "1,x", "NOT_A_NUMBER,y")
      .toDF("value").coalesce(1).write.mode("overwrite").text(path)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "a LONG, b STRING")
    val permissive = Csv.read(spark, path, schema).collect()
    assert(permissive.length === 2) // dirty row kept, bad field nulled
    assert(permissive.count(_.isNullAt(0)) === 1)
    val ff = intercept[org.apache.spark.SparkException] {
      Csv.read(spark, path, schema, failFast = true).collect()
    }
    assert(ff.getMessage != null)
  }

  test("pinned lossy corner: NULL and empty string collapse to null") {
    import spark.implicits._
    val path = tmp("nulls")
    val df = Seq((1L, "x"), (2L, null), (3L, "")).toDF("id", "s")
    Csv.write(df, path)
    val back = Csv.read(spark, path, df.schema)
      .orderBy("id").collect()
    assert(back(0).getString(1) === "x")
    assert(back(1).isNullAt(1))
    assert(back(2).isNullAt(1), "empty string reads back as null — the documented CSV limitation")
  }

  test("quoted delimiter inside a field survives (RFC 4180 escaping)") {
    import spark.implicits._
    val path = tmp("quotes")
    val df = Seq((1L, """he said "hi", twice"""), (2L, "plain")).toDF("id", "s")
    Csv.write(df, path)
    val back = Csv.read(spark, path, df.schema)
    assert(back.collect().map(_.toSeq).toSet === df.collect().map(_.toSeq).toSet)
  }

  test("schema evolution: a TRAILING added nullable column reads as null over old shards") {
    // CSV maps schema to fields by POSITION (Spark's enforceSchema
    // default ignores header names), so the evolution contract is
    // narrower than JSONL's: additions are legal only at the TAIL,
    // where old rows simply run out of fields and PERMISSIVE nulls the
    // remainder
    val docs = table(spark, sfDir, "documents").limit(50)
    val path = tmp("evolve_add")
    Csv.write(docs, path) // old shards: no `quality` field
    val v2 = org.apache.spark.sql.types.StructType(
      docs.schema.fields :+ org.apache.spark.sql.types.StructField(
        "quality", org.apache.spark.sql.types.DoubleType, nullable = true))
    val back = Csv.read(spark, path, v2)
    assert(back.schema.fieldNames.toSeq === v2.fieldNames.toSeq)
    assert(back.filter(col("quality").isNotNull).count() === 0)
    assert(back.drop("quality").collect().map(_.toSeq).toSet ===
      docs.collect().map(_.toSeq).toSet)
  }

  test("schema evolution: column removal = full schema + select, NEVER a narrowed schema") {
    // the pinned hazard that motivates the contract: a mid-schema
    // column dropped from the READ schema shifts every later field one
    // position left — values land under the wrong names, silently.
    // The safe projection reads with the shard's FULL schema and
    // selects; CSV has no column pruning to lose anyway.
    val docs = table(spark, sfDir, "documents").limit(50)
    val path = tmp("evolve_rm")
    Csv.write(docs, path)
    // docs schema: (doc_id, text, lang, source, n_chars) — drop `text`
    val narrow = org.apache.spark.sql.types.StructType(
      docs.schema.fields.filter(_.name != "text"))
    val misaligned = Csv.read(spark, path, narrow)
    // `lang` now (mis)reads the text field: proof the narrow read shifted
    val langs = docs.select("lang").distinct()
      .collect().map(_.getString(0)).toSet
    val misread = misaligned.select("lang")
      .collect().map(r => Option(r.getString(0)).getOrElse("")).toSet
    assert(!misread.subsetOf(langs),
      "narrowed CSV schema unexpectedly aligned — contract may be stale")
    // the safe recipe: full schema, then select
    val projected = Csv.read(spark, path, docs.schema).drop("text")
    assert(projected.collect().map(_.toSeq).toSet ===
      docs.drop("text").collect().map(_.toSeq).toSet)
  }
}
