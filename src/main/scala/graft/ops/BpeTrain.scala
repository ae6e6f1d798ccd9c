package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Distributed BPE merge TRAINING (the learning side of t13's tokenizer
  * application): the classic byte-pair-encoding loop — count adjacent
  * symbol pairs weighted by word frequency, merge the most frequent
  * pair, repeat — run the way production trainers run it: on the
  * AGGREGATED word-frequency vocabulary, never the corpus. The corpus
  * pays exactly one token-count groupBy; every merge round then
  * operates on the (word, pos, symbol) table — |vocab|·avg-word-length
  * rows, thousands not billions — so training cost is independent of
  * corpus size beyond the first scan. This is the same
  * aggregate-then-iterate shape as k-means (Similarity) and PageRank.
  *
  * Each round is pure relational algebra — pair self-join on (word,
  * pos+1), weighted count, (count DESC, pair ASC) argmax broadcast,
  * greedy left-to-right non-overlapping match selection via the
  * run-parity rule (consecutive match positions alternate: within each
  * run of consecutive matches the 1st, 3rd, … are taken — exactly the
  * sequential greedy outcome), rebuild with row_number re-positions —
  * so a SQL oracle replays training EXACTLY, round for round. All
  * windows partition by word (no global windows); the per-round state
  * is localCheckpointed to keep lineage flat across rounds.
  *
  * Output: the learned merge table (round, left, right, merged,
  * pair_count) — `rounds` rows (fewer if the vocabulary exhausts).
  */
object BpeTrain {

  def trainMerges(
      df: DataFrame, textCol: String, rounds: Int = 8): DataFrame = {
    require(rounds >= 1 && rounds <= 30,
      s"rounds must be in [1, 30], got $rounds")
    // one corpus-scale pass: word frequencies
    val words = df
      .select(explode(tokens(lower(col(textCol)))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("c"))
    // initial symbol table: one row per (word, char position)
    val wWord = Window.partitionBy(col("word")).orderBy(col("pos").asc)
    var sym = words
      .select(col("word"), col("c"),
        posexplode(split(col("word"), "")).as(Seq("pos", "sym")))
      .localCheckpoint()
    var merges: DataFrame = null
    var r = 1
    while (r <= rounds) {
      val pairCounts = sym.as("s1")
        .join(sym.as("s2"),
          col("s1.word") === col("s2.word") &&
            col("s2.pos") === col("s1.pos") + 1)
        .groupBy(col("s1.sym").as("l"), col("s2.sym").as("r2"))
        .agg(sum(col("s1.c")).as("pc"))
      val mx = pairCounts
        .orderBy(col("pc").desc, col("l").asc, col("r2").asc).limit(1)
      val roundRow = mx.select(lit(r).as("round"), col("l").as("l_sym"),
        col("r2").as("r_sym"), concat(col("l"), col("r2")).as("merged"),
        col("pc").as("pair_count"))
      merges = if (merges == null) roundRow else merges.unionAll(roundRow)
      // match marks + greedy run-parity selection + rebuild
      val marked = sym.crossJoin(broadcast(mx))
        .withColumn("__next", lead(col("sym"), 1).over(wWord))
        .withColumn("__m",
          when(col("sym") === col("l") && col("__next") === col("r2"), 1)
            .otherwise(0))
      val runs = marked
        // run id: consecutive match positions share (pos − rank among
        // matches); non-matches get null and never group
        .withColumn("__grp",
          when(col("__m") === 1, col("pos") - row_number().over(
            Window.partitionBy(col("word"), col("__m"))
              .orderBy(col("pos").asc))))
      val chosen = runs
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("word"), col("__m"), col("__grp"))
            .orderBy(col("pos").asc)))
        .withColumn("__take",
          (col("__m") === 1 && col("__rn") % 2 === 1).cast("int"))
      sym = chosen
        .withColumn("__dropped",
          lag(col("__take"), 1, 0).over(wWord) === 1)
        .filter(!col("__dropped"))
        .select(col("word"), col("c"),
          row_number().over(wWord).as("pos"),
          when(col("__take") === 1, concat(col("sym"), col("__next")))
            .otherwise(col("sym")).as("sym"))
        .localCheckpoint()
      r += 1
    }
    merges
  }
}
