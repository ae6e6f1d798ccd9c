package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join via key salting.
  *
  * AQE's skew-join handling splits oversized *partitions* of a sort-merge
  * join, which rescues moderate skew — but a single pathological key
  * (the "null key" / "default id" / celebrity-user shape that dominates
  * real 100 TB joins) still lands every one of its probe rows against
  * every matching build row in partitions AQE cannot split finer than the
  * key. Salting fixes the key itself: the probe side spreads each key
  * over `salt` sub-keys, the build side replicates each row to all
  * sub-keys, and the join key becomes (key, salt) — the giant key's work
  * is now `salt`-way parallel. Build-side cost: ×salt rows (use for
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
