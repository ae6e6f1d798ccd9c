package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic, engine-portable sketches.
  *
  * Spark's built-in sketches (HLL++, KLL — q18/q19) are the right 100 TB
  * tools but their internals differ across engines, so they can never
  * hash-match an external oracle. This module holds sketch ALGORITHMS
  * whose every step is portable IEEE/integer arithmetic, so the estimate
  * itself is bit-reproducible: the q26 KMV oracle is a full equality
  * check — a sketch with an exact oracle.
  */
object Sketches {

  /** KMV (k-minimum-values) distinct-count estimate per group.
    *
    * Each key is hashed to a 52-bit value (first 13 hex chars of its
    * md5 — 52 bits so the value and all downstream arithmetic are exact
    * in a double on every engine). Within a group, the k smallest
    * DISTINCT hash values summarize the key set; with u_k = the k-th
    * smallest hash normalized to (0, 1], the standard KMV estimator is
    * `(k-1) / u_k`. Groups with fewer than k distinct hashes report the
    * exact distinct count (the sketch degenerates to the truth).
    *
    * Shape: one partial-agg distinct shuffle of (group, hash) pairs,
    * then a rank-limit window that plans as `WindowGroupLimit` (per-task
    * top-k BEFORE the window's exchange), plus one tiny group count. At
    * the very largest scales the distinct pass itself is the cost — that
    * is exactly what q18's HLL++ trades accuracy for; KMV is the middle
    * point: bounded summary (k values per group), exact oracle-able
    * arithmetic.
    *
    * Output: (groupCol, est_<keyCol> DOUBLE rounded to 6, n_kmv = the
    * summary size actually used).
    */
  /** Per-group quantile ESTIMATES from a deterministic hash sample —
    * the oracle-able counterpart of q19's KLL sketch: sample membership
    * is the md5-bucket rule ([[Sampling.hashBucket]], so both engines
    * agree row for row), and the quantile of the sample is a pure
    * rank-based pick (`rn == ceil(p·n)` under the total order
    * (value, key)), no interpolation — every step integer/IEEE-portable.
    *
    * Estimation error comes only from sampling (~1/√(p·n) quantile
    * deviation); the arithmetic is exact, so q27 hash-matches its
    * oracle. Scale note: each group's SAMPLE flows through one window
    * task — `samplePct` is the knob that bounds it (at 100 TB a 1%
    * sample of a 10⁹-row group is 10⁷ rows per task — fine; the
    * full-data exact quantile this replaces is not).
    *
    * Output: (groupCol, q50, q95, q99) — sample quantiles of `valueCol`.
    */
  def sampledQuantiles(
      df: DataFrame, valueCol: String, keyCol: String, groupCol: String,
      samplePct: Int = 20): DataFrame = {
    require(samplePct >= 1 && samplePct <= 100,
      s"samplePct must be in [1, 100], got $samplePct")
    val s = df.filter(Sampling.hashBucket(col(keyCol)) < samplePct)
      .select(col(groupCol), col(valueCol).as("__v"), col(keyCol).as("__k"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__v").asc, col("__k").asc)
    val ranked = s
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(groupCol))))
    def pick(p: Double) =
      max(when(col("__rn") === ceil(lit(p) * col("__n")), col("__v")))
    ranked.groupBy(col(groupCol))
      .agg(pick(0.50).as("q50"), pick(0.95).as("q95"), pick(0.99).as("q99"))
  }

  /** Per-group KLL-sketch quantiles under a machine-checkable contract.
    *
    * `percentile_approx` (Spark's quantile sketch) is the right 100 TB
    * tool, but its estimates are engine-specific and can never hash-match
    * an external oracle. This operator makes the sketch verifiable anyway:
    * it emits, per group, the EXACT discrete quantiles (actual data
    * values under an integer-arithmetic rank rule — bit-portable across
    * engines) plus a `within_bounds` verdict that checks the sketch's
    * estimate's RANK against the sketch's published guarantee
    * (rank error ≤ n/accuracy). The oracle recomputes the exact columns
    * and asserts the verdict is TRUE; a sketch regression flips the
    * verdict and fails the driver hash.
    *
    * Rank rule (both engines, integer arithmetic only — no float
    * percent-to-rank conversion, which would risk a 1-ulp floor
    * divergence): rank_p = 1 + ((n-1)·p) div 100 under the per-group
    * value sort. Ties share the value, so the picked value is
    * deterministic regardless of tie order.
    *
    * Verdict: the estimate is an actual data value occupying rank
    * interval [count(< est)+1, count(≤ est)]; it passes if that interval
    * overlaps [rank_p − tol, rank_p + tol] with tol = n div accuracy + 2
    * (+2 absorbs the sketch's ceil-vs-floor target-rank definition).
    *
    * Scale: the exact columns ride one per-group sort window — that is
    * the VERIFICATION arm, priced for test scale. At 100 TB you run the
    * estimate alone (or q27's sampled exact pick); this operator is how
    * the sketch earns its trust before you do. Same pattern as the
    * q18/q26 and q19/q27 exact-twin pairs.
    *
    * Output: (groupCol, q50, q95, q99, within_bounds) — q* are the EXACT
    * discrete quantiles; the sketch's estimates stay internal to the
    * verdict.
    */
  def verifiedQuantiles(
      df: DataFrame, valueCol: String, groupCol: String,
      accuracy: Int = 10000): DataFrame = {
    val e = df.select(col(groupCol), col(valueCol).as("__v"))
      .filter(col("__v").isNotNull)
    val ranked = e
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(col("__v").asc)))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(groupCol))))
    def rankOf(p: Int) = expr(s"1 + ((__n - 1) * $p) div 100")
    val exact = ranked.groupBy(col(groupCol)).agg(
      max(when(col("__rn") === rankOf(50), col("__v"))).as("q50"),
      max(when(col("__rn") === rankOf(95), col("__v"))).as("q95"),
      max(when(col("__rn") === rankOf(99), col("__v"))).as("q99"),
      max(col("__n")).as("__n"))
    val est = e.groupBy(col(groupCol)).agg(
      percentile_approx(col("__v"), lit(0.5), lit(accuracy)).as("__e50"),
      percentile_approx(col("__v"), lit(0.95), lit(accuracy)).as("__e95"),
      percentile_approx(col("__v"), lit(0.99), lit(accuracy)).as("__e99"))
    // rank bracket of each estimate: one more scan, broadcast of the
    // |groups|-row estimate table — no extra shuffle of the data
    def cnt(cmp: org.apache.spark.sql.Column) =
      sum(when(cmp, 1L).otherwise(0L))
    val ranks = e.join(broadcast(est), Seq(groupCol))
      .groupBy(col(groupCol)).agg(
        cnt(col("__v") <= col("__e50")).as("__le50"),
        cnt(col("__v") < col("__e50")).as("__lt50"),
        cnt(col("__v") <= col("__e95")).as("__le95"),
        cnt(col("__v") < col("__e95")).as("__lt95"),
        cnt(col("__v") <= col("__e99")).as("__le99"),
        cnt(col("__v") < col("__e99")).as("__lt99"))
    def ok(p: Int, le: String, lt: String) = {
      val target = rankOf(p)
      val tol = expr(s"__n div $accuracy + 2")
      (col(lt) + lit(1) <= target + tol) && (col(le) >= target - tol)
    }
    exact.join(ranks, Seq(groupCol))
      .select(col(groupCol), col("q50"), col("q95"), col("q99"),
        (ok(50, "__le50", "__lt50") && ok(95, "__le95", "__lt95") &&
          ok(99, "__le99", "__lt99")).as("within_bounds"))
  }

  /** Per-group winsorization: clip a metric column to its group's
    * discrete [loPct, hiPct] quantile bounds — the outlier-taming
    * preprocessing step for training signals (reward values, engagement
    * counts) where a fat tail would dominate a mean. Bounds use the
    * same integer rank rule as [[verifiedQuantiles]] and are actual data
    * values, so the clip is bit-portable; clipped rows keep their
    * identity (`was_clipped` flags them for audit).
    *
    * Scale: the bounds ride one per-group sort window (the exact arm —
    * swap in approximate bounds at 100 TB, the clip projection is
    * unchanged) and broadcast back as one row per group; the data-sized
    * side never shuffles for the clip itself.
    *
    * Output: (idCol, groupCol, valueCol, clipped_value, was_clipped).
    */
  def winsorize(
      df: DataFrame, valueCol: String, groupCol: String, idCol: String,
      loPct: Int = 1, hiPct: Int = 99): DataFrame = {
    require(0 <= loPct && loPct < hiPct && hiPct <= 100,
      s"need 0 <= loPct < hiPct <= 100, got ($loPct, $hiPct)")
    val e = df.select(col(idCol), col(groupCol), col(valueCol).as("__v"))
      .filter(col("__v").isNotNull)
    val ranked = e
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(col("__v").asc)))
      .withColumn("__n",
        count(lit(1)).over(Window.partitionBy(col(groupCol))))
    def rankOf(p: Int) = expr(s"1 + ((__n - 1) * $p) div 100")
    val bounds = ranked.groupBy(col(groupCol)).agg(
      max(when(col("__rn") === rankOf(loPct), col("__v"))).as("__lo"),
      max(when(col("__rn") === rankOf(hiPct), col("__v"))).as("__hi"))
    e.join(broadcast(bounds), Seq(groupCol))
      .select(col(idCol), col(groupCol), col("__v").as(valueCol),
        when(col("__v") < col("__lo"), col("__lo"))
          .when(col("__v") > col("__hi"), col("__hi"))
          .otherwise(col("__v")).as("clipped_value"),
        (col("__v") < col("__lo") || col("__v") > col("__hi"))
          .as("was_clipped"))
  }

  /** Exact heavy hitters (frequent keys) in two bounded-memory passes:
    * Misra–Gries candidate generation, then an exact recount of the
    * candidates only.
    *
    * Pass 1 runs a Misra–Gries summary of `capacity` counters inside
    * each partition (mapPartitions — genuinely imperative per-partition
    * state, the one shape the Column algebra can't express) and emits
    * only the surviving KEYS. MG guarantees any key with in-partition
    * frequency > N_p/(capacity+1) survives; a key with global count
    * ≥ N/supportDen must (pigeonhole) reach frequency ≥ N_p/supportDen
    * in at least one partition, so with capacity ≥ supportDen the union
    * of per-partition summaries is a SUPERSET of the true heavy hitters.
    * Pass 2 recounts exactly: a broadcast join tags candidate rows, all
    * other rows group under NULL — which partial aggregation collapses
    * map-side to one row per task — and the final ratio filter makes the
    * result EXACT, {key | count(key)·supportDen ≥ N}, independent of
    * partitioning (the candidate set varies with the split; the output
    * never does). N rides the same tiny aggregate as a frame-less window
    * sum, so there is no extra scan and no driver-side action.
    *
    * Why not plain groupBy+HAVING: at billion-key cardinality the naive
    * plan shuffles ~one row per DISTINCT key even after partial
    * aggregation. Here the shuffle carries ≤ capacity·numPartitions
    * candidate keys plus one null-group row per task, regardless of key
    * cardinality — the 100 TB shape for "find the hot keys" (e.g. to
    * pick [[SkewJoin]] salting targets). Cost: two scans of the input
    * instead of one; at scale the scan is cheap, the vocabulary-wide
    * shuffle is not.
    *
    * Keys are LONG (hash string keys first — the `kgram_hashes` idiom);
    * null keys are dropped. Output: (keyCol, n), exact counts of keys
    * with n·supportDen ≥ N.
    */
  def exactHeavyHitters(
      df: DataFrame, keyCol: String, supportDen: Long,
      capacity: Int = 0): DataFrame = {
    require(supportDen >= 1, s"supportDen must be >= 1, got $supportDen")
    val cap =
      if (capacity > 0) capacity
      else math.min(supportDen, Int.MaxValue.toLong).toInt
    require(cap >= supportDen,
      s"capacity $cap < supportDen $supportDen voids the MG superset guarantee")
    import df.sparkSession.implicits._
    val keys = df.select(col(keyCol).cast("long").as("k"))
      .filter(col("k").isNotNull).as[Long]
    val candidates = keys.mapPartitions { it =>
      val counts = scala.collection.mutable.LongMap.empty[Long]
      it.foreach { k =>
        val c = counts.getOrElse(k, 0L)
        if (c > 0L || counts.size < cap) counts.update(k, c + 1L)
        else {
          // decrement-all; each such event cancels cap+1 units of
          // inserted count, so the sweep is amortized O(1) per row.
          val ks = counts.keysIterator.toArray
          var i = 0
          while (i < ks.length) {
            val v = counts(ks(i))
            if (v == 1L) counts -= ks(i) else counts.update(ks(i), v - 1L)
            i += 1
          }
        }
      }
      counts.keysIterator
    }.toDF("k").distinct()
    val tagged = keys.toDF("k")
      .join(broadcast(candidates.withColumn("__cand", lit(true))),
        Seq("k"), "left")
    val counted = tagged
      .groupBy(when(col("__cand"), col("k")).as("__ck"))
      .agg(count(lit(1)).as("n"))
    counted
      .withColumn("__total", sum(col("n")).over(Window.partitionBy()))
      .filter(col("__ck").isNotNull && col("n") * supportDen >= col("__total"))
      .select(col("__ck").as(keyCol), col("n"))
  }

  /** KMV SET-OPERATION estimates: pairwise Jaccard between per-group key
    * sets, estimated purely from their mergeable KMV sketches — the
    * audience-overlap / cross-source-contamination readout that makes
    * bottom-k sketches strictly stronger than HLL (HLL unions but never
    * intersects). For groups A, B with bottom-k hash sets Kᴬ, Kᴮ, the
    * k smallest of Kᴬ ∪ Kᴮ form a uniform sample of A ∪ B, so
    * ĵ = |K_k(Kᴬ∪Kᴮ) ∩ Kᴬ ∩ Kᴮ| / |K_k| (Beyer et al., SIGMOD'07).
    * Every step — 52-bit md5 hashes, set union, sort, slice, membership
    * — is integer-exact, so unlike HLL the ESTIMATE itself hash-matches
    * the SQL oracle; the exact Jaccard rides alongside for the error
    * readout.
    *
    * Scale shape: one partial-agg'd pass builds the ≤k-long sketch per
    * group (the [[kmvDistinct]] shuffle bound); the pair frame is
    * (groups)² SKETCHES — group counts are small by contract (event
    * types, sources, languages), so the pairing is a broadcast of a
    * handful of ≤k arrays, never touching the corpus. The exact leg is
    * one distinct + one equi-self-join on the key — the d13 overlap
    * shape — and exists for the audit column; at billion-key scale a
    * user drops it and keeps the sketch columns.
    */
  def kmvOverlap(
      df: DataFrame, keyCol: String, groupCol: String,
      k: Int = 64): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val du = df.select(col(groupCol).as("g"), col(keyCol).as("u")).distinct()
    val h = du.select(col("g"),
      conv(substring(md5(col("u").cast("string")), 1, 13), 16, 10)
        .cast("long").as("__h"))
    val sk = h.groupBy(col("g"))
      .agg(graft.expr.nat(graft.expr.KmvSketch(
        graft.expr.toExpr(col("__h")), k).toAggregateExpression())
        .as("__kmv"))
    val pairs = sk.select(col("g").as("type_a"), col("__kmv").as("__ka"))
      .join(broadcast(sk.select(col("g").as("type_b"),
        col("__kmv").as("__kb"))), col("type_a") < col("type_b"))
      .withColumn("__mk", slice(
        array_sort(array_union(col("__ka"), col("__kb"))), 1, k))
      .select(col("type_a"), col("type_b"),
        size(array_intersect(array_intersect(col("__mk"), col("__ka")),
          col("__kb"))).cast("long").as("n_common_minima"),
        size(col("__mk")).as("__m"))
    val n = du.groupBy(col("g")).agg(count(lit(1)).as("__n"))
    val inter = du.select(col("g").as("type_a"), col("u"))
      .join(du.select(col("g").as("type_b"), col("u")), Seq("u"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("__i"))
    pairs
      .join(inter, Seq("type_a", "type_b"), "left")
      .join(n.select(col("g").as("type_a"), col("__n").as("__na")),
        Seq("type_a"))
      .join(n.select(col("g").as("type_b"), col("__n").as("__nb")),
        Seq("type_b"))
      .withColumn("__i", coalesce(col("__i"), lit(0L)))
      .select(col("type_a"), col("type_b"), col("n_common_minima"),
        round(col("n_common_minima").cast("double") /
          col("__m").cast("double"), 6).as("jaccard_est"),
        round(col("__i").cast("double") /
          (col("__na") + col("__nb") - col("__i")).cast("double"), 6)
          .as("jaccard_exact"))
  }

  def kmvDistinct(
      df: DataFrame, keyCol: String, groupCol: String,
      k: Int = 64): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val two52 = 4503599627370496.0 // 2^52, exact in a double
    // ONE aggregation: the native bounded KMV buffer absorbs duplicates
    // and combines map-side (graft.expr.KmvSketch), so the historical
    // distinct-exchange + per-group-sort shape (distinct → window rank ≤
    // k → count join) collapses to a single partial-agg pass whose
    // shuffle carries ≤ k longs per (group, partition). Output values
    // are identical: below the knee the sketch IS the distinct set, at
    // it size()==k ⇔ the exact distinct count ≥ k.
    val h = df.select(
      col(groupCol),
      conv(substring(md5(col(keyCol).cast("string")), 1, 13), 16, 10)
        .cast("long").as("__h"))
    h.groupBy(col(groupCol))
      .agg(graft.expr.nat(graft.expr.KmvSketch(
        graft.expr.toExpr(col("__h")), k).toAggregateExpression())
        .as("__kmv"))
      .select(
        col(groupCol),
        round(
          when(size(col("__kmv")) === k,
            lit((k - 1).toDouble) /
              ((element_at(col("__kmv"), k).cast("double") + lit(1.0))
                / lit(two52)))
            .otherwise(size(col("__kmv")).cast("double")), 6)
          .as(s"est_$keyCol"),
        size(col("__kmv")).cast("long").as("n_kmv"))
  }
}
