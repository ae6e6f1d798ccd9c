package graft

import org.apache.spark.sql.functions._

import graft.Engine.table
import graft.ops.BloomPrune

/** Bloom-pruned join: result identity with the plain join (the bloom's
  * one-sided error must be invisible), including under an adversarially
  * bad filter, plus the executor-side predicate's own contract.
  */
class BloomPruneSpec extends SparkSessionSpec {
  import spark.implicits._

  private def li = table(spark, sfDir, "lineitem")
  private def urgent = table(spark, sfDir, "orders")
    .filter(col("o_orderpriority") === "1-URGENT")
    .select(col("o_orderkey"))

  test("bloom-pruned join == plain join, row for row") {
    val pruned = BloomPrune.bloomPrunedJoin(
        li, urgent, "l_orderkey", "o_orderkey", expectedKeys = 1L << 16)
      .select(col("l_orderkey"), col("l_linenumber"))
      .as[(Long, Long)].collect().sorted
    val plain = li.join(urgent, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"))
      .as[(Long, Long)].collect().sorted
    assert(pruned.nonEmpty && (pruned sameElements plain))
  }

  test("result identity survives a deliberately saturated filter") {
    // undersized filter + huge fpp → false positives by construction;
    // the exact join behind the prune must still erase them all
    val pruned = BloomPrune.bloomPrunedJoin(
        li, urgent, "l_orderkey", "o_orderkey",
        expectedKeys = 8, fpp = 0.5)
      .select(col("l_orderkey"), col("l_linenumber"))
      .as[(Long, Long)].collect().sorted
    val plain = li.join(urgent, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"))
      .as[(Long, Long)].collect().sorted
    assert(pruned sameElements plain)
  }

  test("predicate: no false negatives on inserted keys; prune actually drops rows") {
    val prune = BloomPrune.buildPrune(urgent, "o_orderkey", 1L << 16, 0.01)
    // every true build key must pass the probe-side predicate
    val trueKeys = urgent.select(col("o_orderkey")).distinct()
    val dropped = trueKeys.filter(!prune(col("o_orderkey"))).count()
    assert(dropped === 0, "bloom dropped an inserted key (false negative)")
    // and the predicate must be selective on the fact side: at fpp 1%
    // the surviving fraction ≈ match fraction (~1/5), far under 30%
    val total = li.count()
    val kept = li.filter(prune(col("l_orderkey"))).count()
    assert(kept < total * 3 / 10,
      s"prune kept $kept of $total fact rows — filter not selective")
  }
}
