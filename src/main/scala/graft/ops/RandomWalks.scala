package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic random-walk corpus generation — the DeepWalk/node2vec
  * pre-training-data step: fixed-length walks from every vertex whose
  * token sequences feed a skip-gram embedding trainer. The reference has
  * no graph surface (its MR pipeline stops at word count —
  * `/root/reference/distribution/all/all.js`); this is the training-data
  * extension the brief names, built in the q30/q78 iterative-join
  * discipline.
  *
  * Determinism contract: the step choice is the shared two-round glibc
  * LCG ([[Sharding.lcgRank]]) keyed on (current vertex, step, walk id),
  * taken mod the vertex's degree against an adjacency list ranked by
  * neighbor id — a pure function of (edge set, seed), independent of
  * Spark's physical row order, so the SQL oracle replays every step
  * verbatim (the p07 portability argument).
  *
  * Scale shape: walk state is ONE row per active walk — (start, wid,
  * cur). The graph rides a single per-vertex table of id-sorted
  * neighbor ARRAYS + degree, materialized once; each step is one
  * equi-join of the walk frontier against it on the current vertex,
  * with the pick as element_at(neighbors, lcg mod deg) — no per-step
  * adjacency re-read, no composite-key exchange, and at broadcastable
  * vertex counts AQE turns every step into a broadcast hash join.
  * Array row width is bounded by max degree (the q35 wedge bound).
  * `steps` is a small fixed constant, so the loop unrolls into a
  * linear plan with no growing lineage.
  */
object RandomWalks {

  /** Walk corpus over an undirected edge set `(lo, hi)` (distinct,
    * lo < hi, long-typed). Returns one row per visited position:
    * (start, wid, step, vertex), step 0..steps inclusive, `wid`
    * 0..walksPerVertex−1 — the flattened sentence set a skip-gram
    * window consumes.
    */
  def walkCorpus(
      edges: DataFrame, steps: Int = 4, walksPerVertex: Int = 3,
      seed: Long = 11L): DataFrame = {
    require(steps >= 1 && steps <= 8, s"steps out of the unrolled range: $steps")
    require(walksPerVertex >= 1 && walksPerVertex <= 4,
      s"walksPerVertex out of the key-packing range: $walksPerVertex")
    // ONE vertex table carries the whole graph for the loop: per-vertex
    // id-sorted neighbor ARRAYS + degree, materialized once (the q30
    // iterative-join discipline). Each step is then a single equi-join
    // of the walk frontier against this table on the current vertex —
    // no ranked-adjacency re-read per step, no composite-key exchange;
    // the pick is element_at(neighbors, lcg mod deg). Row width is
    // bounded by max degree (the q35 wedge bound); at broadcastable
    // vertex counts AQE turns every step into a broadcast hash join.
    val both = edges.select(col("lo").as("v"), col("hi").as("n"))
      .unionAll(edges.select(col("hi").as("v"), col("lo").as("n")))
    val nbrs = both.groupBy(col("v"))
      .agg(sort_array(collect_list(col("n"))).as("__ns"),
        count(lit(1)).as("d"))
      .localCheckpoint()
    val deg = nbrs.select(col("v"), col("d"))
    // (cur, step, wid) packs into one LCG key: step·4 + wid ≤ 35 under
    // the requires above, so vertex ids shift past 6 low bits (mod 2³¹
    // inside the LCG, so the shift cannot overflow a long).
    var w = deg
      .withColumn("wid", explode(sequence(lit(0), lit(walksPerVertex - 1))))
      .select(col("v").as("start"), col("wid"), col("v").as("cur"))
    var out = w.select(col("start"), col("wid"),
      lit(0).as("step"), col("cur").as("vertex"))
    for (k <- 1 to steps) {
      w = w
        .join(nbrs.select(col("v").as("cur"), col("__ns"), col("d")),
          Seq("cur"))
        .withColumn("__idx", pmod(
          Sharding.lcgRank(
            col("cur") * 64 + lit(k * 4).cast("long") + col("wid"), seed),
          col("d")))
        .select(col("start"), col("wid"),
          element_at(col("__ns"), (col("__idx") + 1).cast("int"))
            .as("cur"))
      out = out.unionAll(w.select(col("start"), col("wid"),
        lit(k).as("step"), col("cur").as("vertex")))
    }
    out
  }
}
