package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for training-data prep: assign documents to
  * fixed-capacity token bins ("packs") so short documents share a
  * context window instead of wasting padding.
  *
  * Globally optimal packing is inherently sequential, so the scalable
  * contract is NEXT-FIT WITHIN DETERMINISTIC SHARDS: documents are
  * hashed into `(group, shard)` cells, ordered by id within a cell, and
  * packed by the next-fit rule (open a new bin when the next document
  * would overflow `capacity`). Sharding is what makes this a one-shuffle
  * parallel operator: each cell's packing state is only the (id, count)
  * metadata — 16 bytes per doc, so a million-doc shard is ~16 MB of
  * state per task at 100 TB — and cells pack independently. The
  * reference engine has no packing primitive; its closest shape is a
  * grouped fold through the reduce phase
  * (/root/reference/distribution/local/mapperReducer.js:123-136).
  *
  * Determinism end to end: shard = `id % numShards` (portable to the SQL
  * oracle — no engine-specific hash), order = id ascending, next-fit is
  * a pure recurrence ([[graft.expr.PackOps.nextFitBins]]). The p04
  * oracle replays the recurrence per cell in a recursive CTE and
  * hash-matches row for row.
  */
object Packing {

  /** Per-document pack assignment.
    *
    * Output: (idCol, groupCol, shard, bin, n_tokens) — `bin` is the
    * pack index within the (group, shard) cell.
    *
    * @param tokenCount column computing the document's token count
    *                   (any deterministic count; packs never split docs)
    * @param capacity   bin capacity in tokens
    * @param numShards  parallel packing cells per group
    */
  def nextFitPack(
      df: DataFrame, tokenCount: Column,
      idCol: String, groupCol: String,
      capacity: Long, numShards: Int): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val d = df.select(
      col(idCol), col(groupCol),
      pmod(col(idCol), lit(numShards.toLong)).as("shard"),
      tokenCount.cast("long").as("n_tokens"))
    // one shuffle: each (group, shard) cell gathers its doc metadata,
    // sorted by id, and the kernel assigns bins in a single pass
    val packed = d
      .groupBy(col(groupCol), col("shard"))
      .agg(sort_array(collect_list(struct(col(idCol), col("n_tokens"))))
        .as("__ds"))
      .withColumn("__bins", graft.expr.nat(graft.expr.PackExpressions.NextFitBins(
        graft.expr.toExpr(transform(col("__ds"), s => s("n_tokens"))),
        capacity)))
    packed
      .select(col(groupCol), col("shard"),
        explode(arrays_zip(col("__ds"), col("__bins"))).as("__z"))
      .select(
        col(s"__z.__ds.$idCol").as(idCol),
        col(groupCol), col("shard"),
        col("__z.__bins").as("bin"),
        col("__z.__ds.n_tokens").as("n_tokens"))
  }
}
