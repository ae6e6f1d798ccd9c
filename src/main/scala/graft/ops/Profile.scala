package graft.ops

import org.apache.spark.sql.DataFrame
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
}
