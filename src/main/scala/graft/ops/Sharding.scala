package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic seeded global shuffle + shard assignment — the
  * training-data EXPORT step: a corpus leaves the pipeline as N shard
  * files whose concatenation is a seeded pseudorandom permutation of the
  * documents (data order is a training hyperparameter; it must be
  * reproducible from (corpus, seed) alone, never from Spark's physical
  * row order).
  *
  * Mechanics: a two-round LCG (the classic glibc constants) over the id
  * gives every row a deterministic `rank_key` in [0, 2³¹); `shard` is
  * `rank_key mod N` and `pos` the rank-key order within the shard. All
  * arithmetic stays below 2⁶³ by reducing the id mod 2³¹ first, so the
  * identical integer recurrence runs on any engine — the SQL oracle
  * replays it verbatim.
  *
  * Scale shape: one narrow pass computes (rank_key, shard); the only
  * exchange is the shard-keyed window for `pos` — at production N
  * (1024+ shards ≫ cores) per-shard sorts are the embarrassingly
  * parallel unit, and no global sort or single-partition window ever
  * exists. Balance needs no greedy packing at scale: shard token mass
  * concentrates around the mean by the law of large numbers (millions
  * of docs per shard at 100 TB), which is why hash-striping IS the
  * industry export shape.
  */
object Sharding {

  private val M = 2147483648L // 2^31
  private val A = 1103515245L // glibc LCG multiplier
  private val C = 12345L      // glibc LCG increment

  /** The shared two-round LCG rank in [0, 2³¹) as a pure column — the
    * deterministic layout-order primitive every export op keys on (p07
    * shards, m06 byte packing, m07 interleave). Engine-portable: the
    * identical integer recurrence replays in SQL.
    */
  def lcgRank(id: org.apache.spark.sql.Column, seed: Long = 42L): org.apache.spark.sql.Column = {
    val seedC = ((seed % M) + M) % M + C
    val h0 = pmod(id.cast("long"), lit(M))
    val h1 = pmod(h0 * lit(A) + lit(seedC), lit(M))
    pmod(h1 * lit(A) + lit(C), lit(M))
  }

  /** Byte-budget shard packing — the webdataset/tar-shard export plan:
    * rows are laid out in a deterministic seeded order (the same LCG
    * rank as [[shuffleShards]]) and cut into shards of ≈`budgetBytes`
    * each by a running byte total; a row whose bytes would cross the
    * budget boundary starts the next shard's range (shard = exclusive
    * prefix-sum div budget — pure integer arithmetic, so the SQL oracle
    * replays it exactly).
    *
    * Scale shape: the running sum needs a total order, which never
    * exists globally — it is windowed per `groupCol` (media type /
    * source / language — the axis real exports already partition by,
    * since a reader wants homogeneous shards). Each group's window is
    * one sort task; at 100 TB the group axis is chosen so each group is
    * executor-sized (the p08 stratum contract), or the two-level
    * partition-prefix layout takes over. Balance within a group is
    * LLN-tight because the seeded order decorrelates size from position.
    *
    * Output: (idCol, groupCol, n_bytes, shard, offset_bytes) — offset is
    * the row's start position within its shard's byte range.
    */
  def byteBudgetShards(
      df: DataFrame, byteCol: String, budgetBytes: Long,
      groupCol: String, seed: Long = 42L,
      idCol: String = "doc_id"): DataFrame = {
    require(budgetBytes >= 1, s"budgetBytes must be >= 1, got $budgetBytes")
    val seedC = ((seed % M) + M) % M + C
    val h0 = pmod(col(idCol).cast("long"), lit(M))
    val h1 = pmod(h0 * lit(A) + lit(seedC), lit(M))
    val h2 = pmod(h1 * lit(A) + lit(C), lit(M))
    val order = Window.partitionBy(col(groupCol))
      .orderBy(col("rank_key").asc, col(idCol).asc)
    df.select(col(idCol), col(groupCol),
        col(byteCol).cast("long").as("n_bytes"), h2.as("rank_key"))
      .withColumn("__cum_before",
        coalesce(sum(col("n_bytes")).over(
          order.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("shard",
        expr(s"__cum_before div ${budgetBytes}L").cast("int"))
      .withColumn("offset_bytes",
        col("__cum_before") - col("shard").cast("long") * budgetBytes)
      .select(col(idCol), col(groupCol), col("n_bytes"), col("shard"),
        col("offset_bytes"))
  }

  /** (idCol, shard, pos, rank_key): seeded permutation metadata per row.
    * `pos` is 1-based within shard, ordered by (rank_key, id).
    */
  def shuffleShards(
      df: DataFrame, nShards: Int, seed: Long = 42L,
      idCol: String = "doc_id"): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val seedC = ((seed % M) + M) % M + C
    val h0 = pmod(col(idCol).cast("long"), lit(M))
    val h1 = pmod(h0 * lit(A) + lit(seedC), lit(M))
    val h2 = pmod(h1 * lit(A) + lit(C), lit(M))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("rank_key").asc, col(idCol).asc)
    df.select(col(idCol), h2.as("rank_key"))
      .withColumn("shard", pmod(col("rank_key"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w))
      .select(col(idCol), col("shard"), col("pos"), col("rank_key"))
  }
}
