package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point-integer PageRank — the third canonical MapReduce workload
  * (wordcount `q04`, inverted index `t14`, PageRank here), engineered so
  * the iteration is BIT-EXACT across engines.
  *
  * Floating-point PageRank can never hash-match an external oracle: the
  * per-vertex contribution sum is order-dependent in IEEE arithmetic and
  * every shuffle reorders it. Here rank is a scaled BIGINT (`scale` =
  * rank 1.0) and every step is integer arithmetic — contribution =
  * `r div outdeg`, damping = `0.15·scale + (85·Σcontrib) div 100` — so
  * addition is associative-commutative, the result is independent of
  * partitioning and reduce order, and the DuckDB oracle replays the
  * identical recurrence (q30). Truncation bias ≤ 1 ulp-of-scale per term
  * per round on BOTH engines identically; at scale = 10¹² that is ~1e-12
  * of rank mass, far below any ranking-relevant difference.
  *
  * Iteration shape (the 100 TB story): edges ⋈ outdeg are materialized
  * ONCE (localCheckpoint — the d06 round idiom: each round's plan starts
  * from materialized state, not a growing lineage), then every round
  * broadcasts the vertex-sized rank table into the edge scan and pays
  * exactly one exchange: the partially-aggregated dst-keyed contribution
  * shuffle. The edge table — the data-sized side — never moves. Rounds
  * are fixed (`iterations`), not convergence-tested — deterministic
  * cost, and the oracle can unroll the same count.
  *
  * Precondition: every vertex must appear as BOTH src and dst (no
  * dangling mass, no vanishing vertices) — symmetric/bidirectional edge
  * sets satisfy this by construction; `require`d at plan level for the
  * caller's sanity (checked cheaply on the dev scale by the spec, not
  * re-counted at runtime).
  *
  * Output: (vertex, r) — r the scaled fixed-point rank after
  * `iterations` rounds from a uniform `scale` start.
  */
object PageRank {

  def fixedPointPageRank(
      edges: DataFrame, iterations: Int,
      scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1, 50], got $iterations")
    require(scale >= 100L && scale % 100L == 0L,
      s"scale must be a positive multiple of 100, got $scale")
    val e = edges
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .distinct()
    val withDeg = e
      .join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .localCheckpoint()
    var ranks = withDeg.select(col("src").as("vertex")).distinct()
      .withColumn("r", lit(scale))
      .localCheckpoint()
    val base = scale / 100L * 15L
    for (_ <- 1 to iterations) {
      // ranks is vertex-sized — broadcast it so the round's join needs NO
      // distribution and the edge table (the data-sized side) never moves;
      // the only per-round exchange is the partially-aggregated
      // contribution shuffle. Checkpointed frames carry no stats, so
      // without the hint Catalyst planned a sort-merge join and
      // re-exchanged every edge every round (measured 5× the total edge
      // bytes at sf0.1). Billion-vertex graphs outgrow the hint — there
      // the rank table wants bucketed/co-partitioned storage instead;
      // at that point drop the hint and pre-bucket both sides.
      ranks = withDeg
        .join(broadcast(ranks), col("src") === col("vertex"))
        .select(col("dst"), expr("r div outdeg").as("c"))
        .groupBy(col("dst"))
        .agg(expr(s"$base + (85 * sum(c)) div 100").as("r"))
        .select(col("dst").as("vertex"), col("r"))
        .localCheckpoint()
    }
    ranks
  }
}
