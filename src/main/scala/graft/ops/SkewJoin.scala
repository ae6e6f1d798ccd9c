package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join via key salting.
  *
  * WHEN TO PREFER WHICH (SkewJoinSpec cross-checks the two on the same
  * hot-key fixture): AQE's OptimizeSkewedJoin rewrites a shuffled
  * sort-merge/hash JOIN stage at runtime — it splits an oversized
  * partition by map-output ranges (this handles even a SINGLE
  * pathological key: each split re-reads the other side's matching
  * partition in full) with exact sizes and zero code change, so for a
  * plain shuffled equi-join it is the default answer; leave it on and
  * do nothing. Reach for [[saltedJoin]] where AQE's rule cannot act:
  *  - skew into an AGGREGATION or window (AQE only rewrites join
  *    stages; a groupBy on the hot key still serializes — pre-salt and
  *    two-phase the agg);
  *  - the join's output partitioning is REQUIRED downstream (a same-key
  *    groupBy/join above it — AQE skips the split rather than break the
  *    distribution; salting re-keys instead);
  *  - stateful/streaming plans (AQE is disabled there);
  *  - co-partitioned/bucketed sides that never shuffle (no shuffle
  *    stats for AQE to act on).
  * Salting fixes the key itself: the probe side spreads each key over
  * `salt` sub-keys, the build side replicates each row to all sub-keys,
  * and the join key becomes (key, salt) — the giant key's work is now
  * `salt`-way parallel. Build-side cost: ×salt rows (use for
  * small-to-medium build sides that still exceed the broadcast
  * threshold).
  *
  * Inner equi-join semantics are preserved exactly: every (probe, build)
  * match of the plain join occurs in exactly one salt bucket.
  */
object SkewJoin {

  /** @param probe the big, possibly skewed side
    * @param build the smaller side, replicated `salt` ways
    * @param keys  equi-join key columns (present on both sides)
    * @param salt  fan-out; ≈ cores a single hot key should spread over
    */
  def saltedJoin(
      probe: DataFrame, build: DataFrame,
      keys: Seq[String], salt: Int = 16): DataFrame = {
    require(salt > 0)
    // per-row spread via a row uniquifier: hashing row CONTENT would send
    // bit-identical probe rows (exactly the hot-key shape) to one salt
    // bucket, and hash() rejects MapType columns. The salt only routes
    // rows — join RESULTS are identical regardless of placement.
    val p = probe.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salt)))
    val b = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    p.join(b, keys :+ "__salt").drop("__salt")
  }
}
