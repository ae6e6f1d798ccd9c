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
    // merge rows accumulate on the driver: the per-round argmax is ONE
    // row by construction, so it is collected (the PageRank bounded
    // 1-row-stats idiom) and re-enters the plan as literals. The former
    // form kept it as a limit(1) frame, which re-executed that round's
    // pair-count join+agg TWICE more — once building the crossJoin
    // broadcast, once again when the final merges union was evaluated
    // (8 rounds = 16 extra aggregation jobs per run of t29).
    val mergeRows = scala.collection.mutable.Buffer[(Int, String, String, String, Long)]()
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val pairCounts = sym.as("s1")
        .join(sym.as("s2"),
          col("s1.word") === col("s2.word") &&
            col("s2.pos") === col("s1.pos") + 1)
        .groupBy(col("s1.sym").as("l"), col("s2.sym").as("r2"))
        .agg(sum(col("s1.c")).as("pc"))
      val top = pairCounts
        .orderBy(col("pc").desc, col("l").asc, col("r2").asc).limit(1)
        .collect()
      if (top.isEmpty) {
        // vocabulary exhausted: the old empty-limit(1) frames added no
        // rows and emptied sym — identical output, fewer no-op rounds
        exhausted = true
      } else {
        val (lSym, rSym, pc) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        mergeRows += ((r, lSym, rSym, lSym + rSym, pc))
        // match marks + greedy run-parity selection + rebuild
        val marked = sym
          .withColumn("__next", lead(col("sym"), 1).over(wWord))
          .withColumn("__m",
            when(col("sym") === lit(lSym) && col("__next") === lit(rSym), 1)
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
    }
    val spark = df.sparkSession
    import spark.implicits._
    mergeRows.toSeq
      .toDF("round", "l_sym", "r_sym", "merged", "pair_count")
  }
}
