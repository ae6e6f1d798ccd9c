package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
    * ONE scan for ALL columns (the q33 single-pass discipline): each row
    * explodes into one observation per column, and stage 1 is a single
    * (column, shard) aggregation — counts, typed min/max folds, and the
    * distinct-count KMV as [[graft.expr.KmvSketch]], the native bounded
    * aggregate whose partial buffers combine map-side and merge exactly
    * (k-min of a union is the k-min of the k-mins). Stage 2 folds the
    * ≤ columns·nBuckets summary rows: sums, min-of-mins, and a second
    * kmv_sketch over the exploded shard sketches — the merge IS the same
    * aggregate. q26's estimator `(k−1)/(h_k/2⁵²)`, exact below the knee.
    *
    * Columns must be integer- or string-typed (the observation row
    * carries one typed slot each, so min/max fold in native order —
    * doubles would add a formatting-parity hazard for no profiling
    * value).
    *
    * Output: (col_name, n_rows, n_nulls, ndv_est, min_val, max_val).
    */
  def mergeableStats(
      df: DataFrame, bucketKeyCol: String, columns: Seq[String],
      nBuckets: Int = 8, k: Int = 64): DataFrame = {
    require(columns.nonEmpty, "mergeableStats needs at least one column")
    require(nBuckets >= 1 && k >= 2, s"bad nBuckets=$nBuckets / k=$k")
    val two52 = 4503599627370496.0 // 2^52, exact in a double
    def isIntegral(c: String): Boolean = df.schema(c).dataType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case StringType => false
      case t => throw new IllegalArgumentException(
        s"mergeableStats profiles integer/string columns; $c is $t")
    }
    val bucket = pmod(
      conv(substring(md5(col(bucketKeyCol).cast("string")), 1, 8), 16, 10)
        .cast("long"), lit(nBuckets.toLong)).cast("int")
    // one observation per (row, column): the typed value in its slot
    // (the other slot null), the null flag, the 52-bit distinct hash
    val obs = columns.map { c =>
      struct(lit(c).as("col_name"),
        (if (isIntegral(c)) col(c).cast("long")
         else lit(null).cast("long")).as("v_long"),
        (if (isIntegral(c)) lit(null).cast("string")
         else col(c).cast("string")).as("v_str"),
        isnull(col(c)).cast("long").as("is_null"),
        conv(substring(md5(col(c).cast("string")), 1, 13), 16, 10)
          .cast("long").as("h"))
    }
    val ev = df
      .select(bucket.as("__b"), explode(array(obs: _*)).as("o"))
      .select(col("o.col_name"), col("__b"), col("o.v_long"),
        col("o.v_str"), col("o.is_null"), col("o.h"))
    // stage 1: what each shard persists — one aggregation, one scan
    val s1 = ev.groupBy(col("col_name"), col("__b")).agg(
      count(lit(1)).as("rows"), sum(col("is_null")).as("nulls"),
      min(col("v_long")).as("mnl"), max(col("v_long")).as("mxl"),
      min(col("v_str")).as("mns"), max(col("v_str")).as("mxs"),
      graft.expr.nat(graft.expr.KmvSketch(
        graft.expr.toExpr(col("h")), k).toAggregateExpression())
        .as("kmv"))
    // stage 2: assemble the global row from shard summaries alone, in
    // ONE aggregation (consuming s1 twice would re-run the scan): the
    // KMV merge folds the ≤ nBuckets sketches per column via
    // flatten(collect_list) — bounded at nBuckets·k values — then
    // distinct-sort-take-k in the projection (exactly the merge rule)
    val merged = s1.groupBy(col("col_name")).agg(
      sum(col("rows")).as("n_rows"), sum(col("nulls")).as("n_nulls"),
      min(col("mnl")).as("mnl"), max(col("mxl")).as("mxl"),
      min(col("mns")).as("mns"), max(col("mxs")).as("mxs"),
      flatten(collect_list(col("kmv"))).as("cand"))
      .withColumn("kmv",
        slice(array_sort(array_distinct(col("cand"))), 1, k))
      .withColumn("__nc", size(col("kmv")))
      .withColumn("__hk",
        when(col("__nc") === k, element_at(col("kmv"), k)))
    merged.select(
      col("col_name"), col("n_rows"), col("n_nulls"),
      round(when(col("__nc") >= k,
          lit((k - 1).toDouble) /
            ((col("__hk").cast("double") + lit(1.0)) / lit(two52)))
        .otherwise(col("__nc").cast("double")), 6)
        .as("ndv_est"),
      // exactly one typed slot is populated per column — coalesce picks it
      coalesce(col("mnl").cast("string"), col("mns")).as("min_val"),
      coalesce(col("mxl").cast("string"), col("mxs")).as("max_val"))
  }
}
