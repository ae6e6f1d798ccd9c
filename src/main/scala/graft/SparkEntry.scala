package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each module under graft.queries contributes (queries, oracles) pairs;
  * this object is the flat registry the driver harness consumes.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Extended.queries ++
      graft.queries.GraphQueries.queries ++
      graft.queries.StatsQueries.queries ++
      graft.queries.AnalyticsQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.DedupQueries.queries ++
      graft.queries.VectorQueries.queries ++
      graft.queries.StreamQueries.queries ++
      graft.queries.MMQueries.queries ++
      graft.queries.PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.Extended.oracles ++
      graft.queries.GraphQueries.oracles ++
      graft.queries.StatsQueries.oracles ++
      graft.queries.AnalyticsQueries.oracles ++
      graft.queries.TextQueries.oracles ++
      graft.queries.DedupQueries.oracles ++
      graft.queries.VectorQueries.oracles ++
      graft.queries.StreamQueries.oracles ++
      graft.queries.MMQueries.oracles ++
      graft.queries.PipelineQueries.oracles

  /** Oracles whose SQL embeds deterministic-but-DATA-DERIVED constants
    * (e.g. v04's k-means centroids), so the string can only be produced
    * against a concrete data dir. Verify evaluates these at dump time and
    * merges them into oracle_sql.json alongside [[oracleSql]].
    */
  def dynamicOracleSql: Map[String, (SparkSession, String) => String] =
    graft.queries.VectorQueries.dynamicOracles
}
