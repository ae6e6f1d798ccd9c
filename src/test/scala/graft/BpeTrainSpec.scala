package graft

import graft.ops.BpeTrain

/** Hand-unrolled BPE training cases: the classic low/lower corpus (ties
  * broken by (count DESC, pair ASC), a second-order merge building on a
  * first-round symbol) and the same-symbol chain "aaa" where greedy
  * left-to-right selection must take the FIRST overlap only — the case
  * the run-parity rule exists for.
  */
class BpeTrainSpec extends SparkSessionSpec {
  import spark.implicits._

  test("low/lower: tie-break order, second-order merges, full ladder") {
    // counts: low=3, lower=2. Round 1: (l,o)=5 ties (o,w)=5 → pair-ASC
    // picks (l,o). Round 2: (lo,w)=5. Round 3: (e,r)=2 ties (low,e)=2 →
    // "e" < "low". Round 4: (low,er)=2 completes "lower".
    val df = Seq("low low low", "lower lower").toDF("text")
    val got = BpeTrain.trainMerges(df, "text", rounds = 4)
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1, "l", "o", "lo", 5L),
      (2, "lo", "w", "low", 5L),
      (3, "e", "r", "er", 2L),
      (4, "low", "er", "lower", 2L)))
  }

  test("same-symbol chain 'aaa': greedy takes the first overlap only") {
    // Round 1: (a,a) has TWO adjacencies in one word (pc=2) but greedy
    // merges only positions (1,2) → [aa, a]. A wrong rebuild (merging
    // both overlapping pairs, or keeping the dropped slot) would change
    // round 2, which must see exactly (aa, a) once.
    val df = Seq("aaa").toDF("text")
    val got = BpeTrain.trainMerges(df, "text", rounds = 2)
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1, "a", "a", "aa", 2L),
      (2, "aa", "a", "aaa", 1L)))
  }
}
