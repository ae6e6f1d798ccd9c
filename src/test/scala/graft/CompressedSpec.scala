package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.Engine.table
import graft.sources.{Csv, Jsonl}

/** The compressed-ingest boundary: gzip shards read TRANSPARENTLY but
  * are NOT SPLITTABLE — one file is one task no matter its size, which
  * at 100 TB turns a 50 GB .json.gz shard into one core's day. The
  * contract here is (a) lossless transparent reads, (b) the
  * non-splittability is REAL and gated, so nobody "optimizes" ingest
  * into a parallelism collapse, (c) the escape hatch (re-shard to
  * uncompressed) restores split parallelism.
  */
class CompressedSpec extends SparkSessionSpec {

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"gz_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath + "/out"
  }

  test("gzip JSONL round-trips losslessly but reads as ONE task per file") {
    val docs = table(spark, sfDir, "documents")
    val gzPath = tmp("docs")
    Jsonl.write(docs.coalesce(1), gzPath, codec = "gzip")
    val gzFiles = new java.io.File(gzPath).listFiles()
      .count(_.getName.endsWith(".json.gz"))
    assert(gzFiles === 1)

    // force tiny split targets so splittability actually decides the
    // partition count at test scale
    val before = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
      val gz = Jsonl.read(spark, gzPath, docs.schema)
      assert(gz.rdd.getNumPartitions === 1,
        "a gzip file must be exactly one task (non-splittable)")
      assert(gz.collect().map(_.toSeq).toSet ===
        docs.collect().map(_.toSeq).toSet)

      // escape hatch: re-shard to uncompressed restores split parallelism
      val plainPath = tmp("plain")
      Jsonl.write(gz, plainPath)
      val plain = Jsonl.read(spark, plainPath, docs.schema)
      assert(plain.rdd.getNumPartitions > 1,
        "uncompressed JSONL must split under a small split target")
      assert(plain.collect().map(_.toSeq).toSet ===
        docs.collect().map(_.toSeq).toSet)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", before)
  }

  test("gzip CSV round-trips losslessly through the same boundary") {
    val docs = table(spark, sfDir, "documents")
    val path = tmp("csv")
    Csv.write(docs, path, codec = "gzip")
    assert(new java.io.File(path).listFiles()
      .exists(_.getName.endsWith(".csv.gz")))
    val back = Csv.read(spark, path, docs.schema)
    assert(back.collect().map(_.toSeq).toSet ===
      docs.collect().map(_.toSeq).toSet)
  }
}
