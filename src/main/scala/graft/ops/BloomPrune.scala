package graft.ops

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.{nat, toExpr}
import graft.expr.BloomExpressions.BloomMightContainLong

/** Semi-join reduction: prune the BIG side of a join with a bloom filter
  * of the small side's keys BEFORE the join's exchange.
  *
  * The dominant cost of a selective fact⋈dim join at 100 TB is shuffling
  * fact rows that will never match. A bloom filter of the dim keys —
  * built by one distributed pass (`stat.bloomFilter` runs a
  * treeAggregate; only the ~KB filter reaches the driver) — filters the
  * fact scan in place, so non-matching rows die before the exchange
  * instead of after it. False positives (rate `fpp`) merely ride along
  * and are eliminated by the exact join that follows; false negatives
  * don't exist, so the result is IDENTICAL to the plain join —
  * BloomPruneSpec asserts equality, the q29 oracle is the plain SQL join.
  *
  * Spark's own `InjectRuntimeFilter` does this rewrite when column
  * statistics and thresholds line up; this operator is the deterministic
  * version a pipeline can rely on when stats are absent or the planner
  * declines (exactly the regime of fresh intermediate datasets in a
  * curation DAG). The filter is sized by the caller (`expectedKeys` an
  * upper bound on DISTINCT build keys): a 2^16-key / 1% filter is ~77 KB
  * — negligible to ship, and oversizing only lowers the error rate.
  * Keys must be integral (the graft hash-keyed idiom; hash strings
  * first).
  */
object BloomPrune {

  /** The filter-build pass + the pruning predicate, exposed separately so
    * callers can prune several scans with one filter.
    */
  def buildPrune(
      build: DataFrame, buildKey: String,
      expectedKeys: Long, fpp: Double): Column => Column = {
    val bf = build.stat.bloomFilter(buildKey, expectedKeys, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    val bytes = bos.toByteArray
    probe => nat(BloomMightContainLong(toExpr(probe.cast("long")), bytes))
  }

  /** Inner equi-join of `probe` ⋈ `build`, with the probe side
    * bloom-pruned pre-shuffle. Result rows are exactly those of
    * `probe.join(build, probeKey === buildKey)`.
    */
  def bloomPrunedJoin(
      probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val prune = buildPrune(build, buildKey, expectedKeys, fpp)
    probe.filter(prune(col(probeKey)))
      .join(build, col(probeKey) === col(buildKey))
  }
}
