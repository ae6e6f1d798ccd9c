package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Single-pass column profiling — the ingest-QA signal a curation
  * pipeline computes before trusting a new data drop: per-column row
  * count, null count, and EXACT distinct count.
  *
  * One `agg` carries every column's aggregates, so the input is scanned
  * once: Catalyst plans the multi-distinct aggregation as one Expand
  * (×columns row replication) feeding a single shuffle keyed by the
  * expand tag + value — at any scale that is one pass over the data and
  * one distinct-sized exchange, not a scan per column. Exact distincts
  * are the QA contract (a checksum, comparable run to run); when an
  * estimate is acceptable at extreme cardinality, q18's HLL++ is the
  * drop-in (no oracle).
  *
  * Output: one row per profiled column — (col_name, n_rows, n_nulls,
  * n_distinct). Long format (stack), so downstream rules ("null rate
  * above threshold?") are plain filters.
  */
object Profile {

  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    val aggs = count(lit(1)).as("__n") +: columns.flatMap { c =>
      Seq(
        sum(isnull(col(c)).cast("long")).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = columns
      .map(c => s"'$c', `__nn_$c`, `__nd_$c`").mkString(", ")
    wide.select(
      expr(s"stack(${columns.size}, $stackArgs) AS (col_name, n_nulls, n_distinct)"),
      col("__n").as("n_rows"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"))
  }

  /** MERGEABLE column stats — the incremental-ANALYZE shape: rows land
    * in `nBuckets` ingest shards (md5 of `bucketKeyCol`), every shard
    * computes its stats INDEPENDENTLY (stage 1), and the global answer
    * is assembled purely from shard summaries (stage 2) — so a 100 TB
    * catalog refresh after one new shard re-reads ONE shard, not the
    * table. ProfileSpec pins the defining property: the merged output is
    * invariant to the bucket count (merge(shards) == direct global).
    *
    * Per column: rows/nulls sum across shards; min/max fold across
    * shards (native-type comparison, stringified only in the output);
    * distinct-count via KMV — the mergeable-by-construction sketch: a
    * shard keeps its k smallest distinct 52-bit md5 hashes, and the
    * union's k smallest are exactly the global k smallest (any hash in
    * the global bottom-k is in its own shard's bottom-k), so the merged
    * estimate is bit-identical to a direct global KMV — q26's estimator,
    * `(k-1) / (h_k / 2^52)`, exact below k. The merge-side window ranks
    * at most nBuckets·k candidate rows — bounded state, annotated single
    * partition by construction.
    *
    * Output: (col_name, n_rows, n_nulls, ndv_est, min_val, max_val).
    */
  def mergeableStats(
      df: DataFrame, bucketKeyCol: String, columns: Seq[String],
      nBuckets: Int = 8, k: Int = 64): DataFrame = {
    require(columns.nonEmpty, "mergeableStats needs at least one column")
    require(nBuckets >= 1 && k >= 2, s"bad nBuckets=$nBuckets / k=$k")
    val two52 = 4503599627370496.0 // 2^52, exact in a double
    val bucket = pmod(
      conv(substring(md5(col(bucketKeyCol).cast("string")), 1, 8), 16, 10)
        .cast("long"), lit(nBuckets.toLong)).cast("int")
    val withB = df.withColumn("__b", bucket)
    columns.map { c =>
      // stage 1a: per-shard scalar stats (what each shard persists)
      val s1 = withB.groupBy(col("__b")).agg(
        count(lit(1)).as("rows"),
        sum(isnull(col(c)).cast("long")).as("nulls"),
        min(col(c)).as("mn"), max(col(c)).as("mx"))
      // stage 1b: per-shard KMV candidates (k smallest distinct hashes;
      // WindowGroupLimit keeps the per-task state at k pre-shuffle)
      val h = withB.select(col("__b"),
          conv(substring(md5(col(c).cast("string")), 1, 13), 16, 10)
            .cast("long").as("__h"))
        .filter(col("__h").isNotNull).distinct()
      val cand = h
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("__b")).orderBy(col("__h").asc)))
        .filter(col("__rn") <= k)
        .select(col("__h")).distinct()
      // stage 2: merge shard summaries — sums/folds + global k-min rank
      // over the <= nBuckets*k candidate rows (bounded by construction)
      val merged = s1.agg(
        sum(col("rows")).as("n_rows"), sum(col("nulls")).as("n_nulls"),
        min(col("mn")).cast("string").as("min_val"),
        max(col("mx")).cast("string").as("max_val"))
      val ranked = cand.withColumn("__rn",
        row_number().over(Window.orderBy(col("__h").asc)))
      val kmv = ranked
        .agg(count(lit(1)).as("__nc"),
          max(when(col("__rn") === k, col("__h"))).as("__hk"))
        .select(
          round(when(col("__nc") >= k,
              lit((k - 1).toDouble) /
                ((col("__hk").cast("double") + lit(1.0)) / lit(two52)))
            .otherwise(col("__nc").cast("double")), 6).as("ndv_est"))
      merged.crossJoin(kmv).select(
        lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
        col("ndv_est"), col("min_val"), col("max_val"))
    }.reduce(_ unionAll _)
  }
}
