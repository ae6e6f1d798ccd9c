package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal / non-equi join operators the reference cannot express at all
  * (SURVEY §2.6 — it has no joins) and Spark has no single operator for.
  * Both are built to the one-shuffle scale shape rather than the naive
  * O(n·m) nested-loop plans Catalyst would pick for the raw predicates.
  */
object TemporalJoins {

  /** AS-OF join: for each left row, the single right row with the greatest
    * `rightTs` ≤ the left row's `leftTs`, per join key (inner: left rows
    * with no prior right row are dropped).
    *
    * Realization: tag both sides, union, ONE hash-shuffle on the key, and
    * a running `last(_, ignoreNulls)` window ordered by (ts, side) — right
    * rows sort before left rows at equal ts, making the match inclusive.
    * This is the merge-scan asof algorithm: O(n log n) within partitions,
    * no range-join blowup, no per-row probe. A naive formulation
    * (`l JOIN r ON key AND r.ts <= l.ts` + max-window) shuffles the
    * quadratic prefix-match stream; this never materializes it.
    *
    * Caller contract: `right` has at most one row per (key, rightTs) —
    * pre-aggregate if not (the match would otherwise be ambiguous in any
    * engine; DuckDB ASOF has the same contract).
    *
    * Skew: the default single window serializes each key into one task —
    * fine for natural key spreads (users, orders), a straggler when one
    * celebrity key dominates. Pass `skewBucket = Some("hour" | "day" |
    * ...)` (a `date_trunc` granularity of the timestamp columns) to run
    * the window per (key, time-bucket) instead: in-bucket running match
    * plus a carry of each bucket's final match from preceding buckets —
    * computed over one row per (key, bucket), so the hot key's row volume
    * spreads across buckets while the carry pass stays tiny. Identical
    * output (TemporalJoinsSpec proves it); two extra small shuffles.
    *
    * @param rightCols right-side payload columns, emitted as `asof_<name>`
    */
  def asofJoin(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      rightCols: Seq[String], skewBucket: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val rStruct = struct(
      (col(rightTs) +: rightCols.map(col)).map(c => c): _*).as("__r")
    // SQL ASOF semantics: a NULL timestamp can never satisfy r.ts <= l.ts,
    // so null-ts rows match nothing on either side. Without this filter a
    // null right ts sorts FIRST and becomes the running match for every
    // earlier left row.
    val left0 = left.filter(col(leftTs).isNotNull)
    val right0 = right.filter(col(rightTs).isNotNull)
    val l2 = left0.select(
      col(key).as("__k"), col(leftTs).as("__t"), lit(1).as("__side"),
      struct(leftCols.map(col): _*).as("__l"), lit(null).cast(
        right.select(rStruct).schema("__r").dataType).as("__r"))
    val r2 = right0.select(
      col(key).as("__k"), col(rightTs).as("__t"), lit(0).as("__side"),
      lit(null).cast(left.select(struct(leftCols.map(col): _*).as("__l"))
        .schema("__l").dataType).as("__l"), rStruct)
    val unioned = l2.unionByName(r2)
    val matched = skewBucket match {
      case None =>
        val w = Window.partitionBy(col("__k"))
          .orderBy(col("__t").asc, col("__side").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        unioned.withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      case Some(g) =>
        val b = unioned.withColumn("__b", date_trunc(g, col("__t")))
        // pass 1: running match WITHIN each (key, bucket) — the hot key's
        // rows now split across its buckets
        val wIn = Window.partitionBy(col("__k"), col("__b"))
          .orderBy(col("__t").asc, col("__side").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val inb = b.withColumn("__m0", last(col("__r"), ignoreNulls = true).over(wIn))
        // pass 2 (tiny: one row per (key, bucket)): each bucket's final
        // right row, then the last such from STRICTLY PRECEDING buckets —
        // safe to carry because any earlier bucket's right ts < this
        // bucket's every left ts
        val bfin = b.filter(col("__side") === 0)
          .groupBy(col("__k"), col("__b"))
          .agg(max_by(col("__r"), col("__t")).as("__bf"))
        val wc = Window.partitionBy(col("__k")).orderBy(col("__b").asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val carry = b.select(col("__k"), col("__b")).distinct()
          .join(bfin, Seq("__k", "__b"), "left")
          .withColumn("__carry", last(col("__bf"), ignoreNulls = true).over(wc))
          .select(col("__k"), col("__b"), col("__carry"))
        inb.join(carry, Seq("__k", "__b"))
          .withColumn("__m", coalesce(col("__m0"), col("__carry")))
    }
    matched
      .filter(col("__side") === 1 && col("__m").isNotNull)
      .select(
        leftCols.map(c => col(s"__l.$c").as(c)) ++
          (col(s"__m.$rightTs").as(s"asof_$rightTs") +:
            rightCols.map(c => col(s"__m.$c").as(s"asof_$c"))): _*)
  }

  /** Banded range join: `left JOIN right ON lo(right) <= v(left) <= hi(right)`
    * rewritten as an equi-join. Each right row is exploded to the integer
    * bands its [lo, hi] interval overlaps; each left row hashes to the one
    * band containing v; band equality is then a plain shuffled equi-join
    * and the exact predicate filters within bands. Catalyst's own plan for
    * the raw predicate is BroadcastNestedLoop — O(|L|·|R|) compares; this
    * is O(|L| + |R|·bands + candidates).
    *
    * @param bandWidth band size in value units — pick ≈ the typical
    *                  interval width so each interval spans ~1-2 bands
    */
  def bandedRangeJoin(
      left: DataFrame, right: DataFrame,
      leftVal: Column, lo: Column, hi: Column,
      bandWidth: Double): DataFrame = {
    // candidate checks per probe row scale with the in-band right count —
    // the probe side must not be parallelism-collapsed by a small
    // single-row-group scan (identity at production split counts)
    val lb = widen(left).withColumn("__band",
      floor(leftVal / lit(bandWidth)).cast("long"))
    val rb = right
      .withColumn("__lo", lo).withColumn("__hi", hi)
      .withColumn("__band", explode(sequence(
        floor(col("__lo") / lit(bandWidth)).cast("long"),
        floor(col("__hi") / lit(bandWidth)).cast("long"))))
    lb.join(rb, Seq("__band"))
      .filter(leftVal >= col("__lo") && leftVal <= col("__hi"))
      .drop("__band", "__lo", "__hi")
  }
}
