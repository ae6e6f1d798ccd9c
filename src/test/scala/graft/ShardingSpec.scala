package graft

import org.apache.spark.sql.functions._

import graft.Engine.table
import graft.ops.Sharding

/** Seeded global shuffle/shard export plan (p07): permutation and
  * determinism properties, plus a driver-side replay of the LCG
  * recurrence as an independent second implementation.
  */
class ShardingSpec extends SparkSessionSpec {
  import spark.implicits._

  private val M = 2147483648L
  private def lcg(id: Long, seed: Long): Long = {
    val h0 = id % M
    val h1 = (h0 * 1103515245L + (((seed % M) + M) % M + 12345L)) % M
    (h1 * 1103515245L + 12345L) % M
  }

  test("rank_key matches the driver-side LCG replay, shard = key mod N") {
    val out = Sharding.shuffleShards(
        table(spark, sfDir, "documents"), nShards = 8, seed = 42L)
      .select("doc_id", "shard", "rank_key")
      .as[(Long, Int, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, shard, key) =>
      assert(key === lcg(id, 42L), s"doc $id")
      assert(shard === (key % 8).toInt)
    }
  }

  test("output is a partitioned permutation: every doc once, pos dense per shard") {
    val docs = table(spark, sfDir, "documents")
    val out = Sharding.shuffleShards(docs, nShards = 8, seed = 42L)
      .select("doc_id", "shard", "pos").as[(Long, Int, Int)].collect()
    assert(out.map(_._1).distinct.length === out.length)
    assert(out.length === docs.count())
    // pos is 1..|shard| dense within each shard
    out.groupBy(_._2).values.foreach { rows =>
      assert(rows.map(_._3).sorted.toSeq === (1 to rows.length))
    }
    // a corpus of sequential ids spreads across all 8 shards
    assert(out.map(_._2).distinct.length === 8)
  }

  test("same seed reproduces bit-for-bit; a different seed permutes differently") {
    val docs = table(spark, sfDir, "documents")
    val a = Sharding.shuffleShards(docs, 8, seed = 42L).collect().toSet
    val b = Sharding.shuffleShards(docs, 8, seed = 42L).collect().toSet
    val c = Sharding.shuffleShards(docs, 8, seed = 7L).collect().toSet
    assert(a === b)
    assert(a !== c)
  }

  test("incremental-stable: a doc's (shard, rank_key) never changes as the corpus grows") {
    // the property an INCREMENTAL export needs: admitting new documents
    // must not reshuffle already-exported ones — shard and rank derive
    // from the id alone, so the half-corpus assignment is a strict
    // subset of the full-corpus assignment (only within-shard pos can
    // shift as new rows interleave)
    val docs = table(spark, sfDir, "documents")
    val half = Sharding.shuffleShards(docs.filter(col("doc_id") % 2 === 0), 8)
      .select("doc_id", "shard", "rank_key")
      .as[(Long, Int, Long)].collect()
      .map { case (id, s, k) => id -> ((s, k)) }.toMap
    val full = Sharding.shuffleShards(docs, 8)
      .select("doc_id", "shard", "rank_key")
      .as[(Long, Int, Long)].collect()
      .map { case (id, s, k) => id -> ((s, k)) }.toMap
    assert(half.nonEmpty)
    half.foreach { case (id, sk) => assert(full(id) === sk, s"doc $id moved") }
  }

  test("partition-invariant: 1 vs 8 input partitions give identical output") {
    val docs = table(spark, sfDir, "documents")
    val a = Sharding.shuffleShards(docs.repartition(1), 8).collect().toSet
    val b = Sharding.shuffleShards(docs.repartition(8), 8).collect().toSet
    assert(a === b)
  }

  test("byte-budget shards match a driver-side prefix-sum replay") {
    val m = table(spark, sfDir, "documents")
      .select(col("doc_id"), (col("doc_id") % 3).cast("string").as("grp"),
        length(col("text")).cast("long").as("nb"))
    val got = Sharding.byteBudgetShards(m, "nb", 1024L, "grp")
      .as[(Long, String, Long, Int, Long)].collect()
    val rows = m.as[(Long, String, Long)].collect()
    val expect = rows.groupBy(_._2).toSeq.flatMap { case (g, rs) =>
      var cum = 0L
      rs.sortBy(r => (lcg(r._1, 42L), r._1)).toIndexedSeq.map { case (id, _, nb) =>
        val shard = (cum / 1024L).toInt
        val out = (id, g, nb, shard, cum - shard * 1024L)
        cum += nb
        out
      }
    }.toSet
    assert(got.toSet === expect)
    assert(got.nonEmpty)
    got.foreach { case (id, _, _, s, off) =>
      assert(s >= 0 && off >= 0 && off < 1024L, s"doc $id shard range")
    }
  }

  test("byte-budget shards are partition-invariant and budget-monotone") {
    val m = table(spark, sfDir, "documents")
      .select(col("doc_id"), lit("g").as("grp"),
        length(col("text")).cast("long").as("nb"))
    val a = Sharding.byteBudgetShards(m.repartition(1), "nb", 2048L, "grp")
      .collect().toSet
    val b = Sharding.byteBudgetShards(m.repartition(8), "nb", 2048L, "grp")
      .collect().toSet
    assert(a === b)
    // a bigger budget can only merge shards, never split: shard count shrinks
    val nSmall = Sharding.byteBudgetShards(m, "nb", 1024L, "grp")
      .select("shard").distinct().count()
    val nBig = Sharding.byteBudgetShards(m, "nb", 8192L, "grp")
      .select("shard").distinct().count()
    assert(nBig <= nSmall)
  }
}
