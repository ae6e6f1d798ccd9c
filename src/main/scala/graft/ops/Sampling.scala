package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training pipelines.
  *
  * Everything keys off a content hash (md5 of the key column), never a
  * random number: the same row lands in the same split on every run, on
  * any cluster, at any partitioning — the property training/eval splits
  * must have for reproducibility and leak-freedom. (Spark's
  * `randomSplit` is seed-stable only for a fixed partitioning; a
  * repartitioned or appended-to dataset reshuffles membership.)
  */
object Sampling {

  /** Bucket in [0, 100) derived from the key's md5 — the split
    * coordinate. First 8 hex chars → int, mod 100; md5 exists everywhere
    * (engine-portable, so oracles can reproduce membership exactly).
    */
  def hashBucket(key: Column): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(100L)).cast("int")

  /** Label each row train/val/test by cumulative percentage bands, e.g.
    * (80, 10) → [0,80) train, [80,90) val, [90,100) test.
    */
  def split(df: DataFrame, keyCol: String,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split bands: train=$trainPct val=$valPct")
    val b = hashBucket(col(keyCol))
    df.withColumn("split",
      when(b < trainPct, lit("train"))
        .when(b < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** Deterministic ~pct% sample: rows whose hash bucket falls below pct.
    * Membership is stable under repartitioning, appends, and re-runs.
    */
  def hashSample(df: DataFrame, keyCol: String, pct: Int): DataFrame =
    df.filter(hashBucket(col(keyCol)) < pct)

  /** Stratified deterministic sample: the ⌈n·fraction⌉ smallest rows per
    * stratum in md5 order — every non-empty stratum is represented (a
    * floor rule would silently drop strata smaller than den/num rows, and
    * a flat hashSample under-represents small strata by variance). One
    * shuffle on the stratum column.
    */
  def stratifiedSample(
      df: DataFrame, stratumCol: String, keyCol: String,
      num: Int, den: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(md5(col(keyCol).cast("string")).asc, col(keyCol).asc)
    val cnt = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(cnt))
      // keep ⌈n·num/den⌉ rows: rn ≤ ⌈n·num/den⌉ ⇔ (rn−1)·den < n·num
      .filter((col("__rn") - 1) * den < col("__n") * num)
      .drop("__rn", "__n")
  }

  /** Temperature-flavored domain-mixture sample (the DoReMi/multilingual
    * upsampling shape at τ = 0.5): domain quotas proportional to √n
    * instead of n, so small domains are over-represented relative to
    * their raw share; rows within a domain are picked in md5 order (the
    * same deterministic coordinate every sampler here uses).
    *
    * quota(d) = target · isqrt(n_d) ÷ Σ isqrt(n_d), computed ENTIRELY in
    * integer arithmetic (isqrt = ⌊√n⌋ of the correctly-rounded IEEE
    * sqrt, integer sum, integer division) — bit-exact in any engine, no
    * float accumulation whose ulp drift could flip a quota by one.
    *
    * Shape: one tiny domain aggregate (|domains| rows, windowed total),
    * broadcast back onto the corpus, one per-domain rank window — the
    * stratifiedSample plan with a data-derived rate. Scales like q22.
    */
  def temperatureSample(
      df: DataFrame, stratumCol: String, keyCol: String,
      target: Int): DataFrame = {
    val s = floor(sqrt(count(lit(1)))).cast("long")
    val quotas = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("__n"), s.as("__s"))
      // unordered whole-frame window: sum over ALL domain rows (the
      // domain table is |domains|-sized, so the single-partition window
      // is a non-issue)
      .withColumn("__ss", sum(col("__s")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col(stratumCol),
        expr(s"$target * __s div __ss").as("__quota"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(md5(col(keyCol).cast("string")).asc, col(keyCol).asc)
    df.join(broadcast(quotas), Seq(stratumCol))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__quota"))
      .drop("__rn", "__quota")
  }

  /** Token-BUDGET sampling: per stratum, admit documents in the
    * deterministic md5 order until the stratum's running TOKEN total
    * would exceed `budget` — epoch planning counts tokens, not
    * documents ([[temperatureSample]] fixes doc quotas; a mixture spec
    * is "N billion tokens of code, M of web", which this implements).
    * A doc is kept iff the cumulative token count THROUGH it stays ≤
    * budget (first-fit prefix, so one oversized doc past the line
    * doesn't starve nothing-after-it; the prefix rule keeps membership
    * a pure function of (corpus, budget)).
    *
    * Integer cumulative sum over an md5-ranked per-stratum window —
    * exact in any engine, one shuffle on the stratum key. Strata are
    * the parallel unit (the q22/p02 scale shape).
    *
    * Output: (keyCol, stratumCol, n_tokens, cum_tokens).
    */
  def tokenBudgetSample(
      df: DataFrame, stratumCol: String, keyCol: String,
      tokens: Column, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(md5(col(keyCol).cast("string")).asc, col(keyCol).asc)
    df.withColumn("__tok", tokens.cast("long"))
      .withColumn("__cum", sum(col("__tok")).over(w))
      .filter(col("__cum") <= budget)
      .select(col(keyCol), col(stratumCol),
        col("__tok").as("n_tokens"), col("__cum").as("cum_tokens"))
  }

  /** Deterministic negative-edge sampling for link-prediction /
    * graph-embedding training: per source vertex, `perSrc` candidate
    * destinations drawn by the shared two-round LCG (the p07 shuffle
    * recurrence, seeded) over a DENSE destination domain, minus the
    * edges that actually exist. Candidates that collide with a real
    * edge (or with each other) are dropped, not re-drawn — the standard
    * oversample-and-filter shape, and the reason output size per src is
    * ≤ perSrc, not exactly perSrc.
    *
    * `dstDomainMax` is the dense-domain size: candidate raw values map
    * to destination ids via `dstOf(h mod dstDomainMax)`. Passing the
    * domain bound explicitly (a catalog constant like max part key)
    * keeps the op action-free; the draw is a pure column function of
    * (src, j, seed), so membership survives repartitioning and corpus
    * growth — the [[split]] reproducibility contract.
    *
    * Scale: one explode (perSrc rows per src) + one anti-join on the
    * edge key — the anti-join is the only exchange, keyed like the edge
    * table itself. All arithmetic stays below 2⁶³ (mod-2³¹ reduction
    * first).
    *
    * Output: (src, dst, j) — j the draw index, deduped to the smallest
    * j per surviving (src, dst).
    */
  def negativeEdges(
      edges: DataFrame, dstDomainMax: Long, dstOf: Column => Column,
      perSrc: Int = 4, seed: Long = 42L): DataFrame = {
    require(perSrc >= 1, s"perSrc must be >= 1, got $perSrc")
    require(dstDomainMax >= 1, s"dstDomainMax must be >= 1, got $dstDomainMax")
    val M = 2147483648L
    val A = 1103515245L
    val C = 12345L
    val seedC = ((seed % M) + M) % M + C
    val h0 = pmod(col("src") * perSrc + col("j"), lit(M))
    val h1 = pmod(h0 * lit(A) + lit(seedC), lit(M))
    val h2 = pmod(h1 * lit(A) + lit(C), lit(M))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src"), col("dst")).orderBy(col("j").asc)
    edges.select(col("src")).distinct()
      .select(col("src"),
        explode(sequence(lit(0), lit(perSrc - 1))).as("j"))
      .withColumn("dst", dstOf(pmod(h2, lit(dstDomainMax))))
      .join(edges, Seq("src", "dst"), "left_anti")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("src"), col("dst"), col("j"))
  }

  /** Data-constrained epoch planning: turn a global token `budget` into
    * per-stratum repeat counts. Each stratum (domain/language/source)
    * holding T_s tokens gets a quota ∝ ⌊√T_s⌋ (the [[temperatureSample]]
    * flattening, so small-but-valuable strata aren't starved), and the
    * quota becomes a whole number of EPOCHS over the stratum —
    * `ceil(quota / T_s)` capped at `maxEpochs`, after the empirical
    * result that repeating data beyond ~4 epochs stops buying loss
    * (the data-constrained-scaling recipe: up-repeat small domains
    * instead of over-sampling the big one). `planned_tokens` is what the
    * schedule actually delivers: min(quota, epochs·T_s).
    *
    * All integer arithmetic (`div` floor division, ceil as
    * `(q + T − 1) div T`), so the plan is engine-reproducible. Scale:
    * one partially-aggregated groupBy to T_s (stratum cardinality rows),
    * then a whole-frame window over |strata| rows — the p02 shape; the
    * corpus itself is touched once.
    *
    * Output: (stratumCol, n_tokens, quota, epochs, planned_tokens).
    */
  def epochPlan(
      df: DataFrame, stratumCol: String, tokens: Column,
      budget: Long, maxEpochs: Int = 4): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    df.groupBy(col(stratumCol))
      .agg(sum(tokens.cast("long")).as("n_tokens"),
        floor(sqrt(sum(tokens.cast("long")))).cast("long").as("__s"))
      .filter(col("n_tokens") > 0)
      .withColumn("__ss", sum(col("__s")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("quota", expr(s"$budget * __s div __ss"))
      .withColumn("epochs",
        least(lit(maxEpochs.toLong),
          expr("(quota + n_tokens - 1) div n_tokens")))
      .withColumn("planned_tokens",
        least(col("quota"), col("epochs") * col("n_tokens")))
      .select(col(stratumCol), col("n_tokens"), col("quota"),
        col("epochs"), col("planned_tokens"))
  }

  /** Temporal holdout with an embargo gap — the leakage-safe split for
    * TIME-ordered data, where hash splits ([[split]]) silently leak the
    * future into training. The cutoff is DATA-DERIVED by the exact
    * histogram-pick rule (smallest epoch-day with 100·cum ≥ trainPct·n
    * over the per-day count aggregate — the q73 percentile shape, pure
    * BIGINT): rows on days ≤ cutoff−embargoDays train; days > cutoff
    * test; the embargo band between is DROPPED, so no training example
    * sits within `embargoDays` of any test example (label-horizon
    * leakage at the boundary).
    *
    * One partial-agg day histogram (the cutoff pick runs over ≤ #days
    * rows), then one stateless scan assigns splits — nothing data-sized
    * is ever sorted or windowed.
    *
    * Output: per split (train/embargo/test): n_rows, n_keys (distinct
    * `keyCol`), day_min, day_max — the audit a pipeline logs before
    * training on a temporal split.
    */
  def temporalHoldout(
      df: DataFrame, tsCol: String, keyCol: String,
      trainPct: Int = 80, embargoDays: Int = 7): DataFrame = {
    require(trainPct >= 1 && trainPct <= 99,
      s"trainPct must be in [1, 99], got $trainPct")
    require(embargoDays >= 0, s"embargoDays must be >= 0, got $embargoDays")
    val days = df.select(col(keyCol).as("__k"),
        unix_timestamp(col(tsCol)).as("__t"))
      .select(col("__k"), expr("__t div 86400").as("__d"))
    val hist = days.groupBy(col("__d")).agg(count(lit(1)).as("__c"))
    val wCum = org.apache.spark.sql.expressions.Window
      .orderBy(col("__d").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cutoff = hist
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .agg(min(when(col("__cum") * 100 >= col("__n") * trainPct,
        col("__d"))).as("__cut"))
    days.crossJoin(broadcast(cutoff))
      .select(col("__k"), col("__d"),
        when(col("__d") <= col("__cut") - embargoDays, "train")
          .when(col("__d") > col("__cut"), "test")
          .otherwise("embargo").as("split"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(col("__k")).as("n_keys"),
        min(col("__d")).as("day_min"), max(col("__d")).as("day_max"))
  }
}
