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
      scale: Long = 1000000000000L,
      broadcastMaxVertices: Long = 2L * 1000 * 1000): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1, 50], got $iterations")
    require(scale >= 100L && scale % 100L == 0L,
      s"scale must be a positive multiple of 100, got $scale")
    val e = edges
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .distinct()
    val withDeg0 = e
      .join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .localCheckpoint()
    var ranks = withDeg0.select(col("src").as("vertex")).distinct()
      .withColumn("r", lit(scale))
      .localCheckpoint()
    // Two regimes for the per-round rank⋈edge join. Below the gate the
    // vertex table fits an executor: broadcast it, the edge table never
    // moves, the round's only exchange is the contribution shuffle.
    // Above the gate (billions of vertices — no broadcast budget holds a
    // vertex table) pin the edge table hash-partitioned on `src` ONCE;
    // localCheckpoint preserves that physical partitioning, so every
    // round's sort-merge join re-exchanges only the vertex-sized rank
    // side, never the edges. The count and the gated repartition both
    // read the already-materialized checkpoint — the edge join itself
    // computes exactly once either way.
    val useBroadcast = ranks.count() <= broadcastMaxVertices
    val withDeg =
      if (useBroadcast) withDeg0
      else withDeg0.repartition(col("src")).localCheckpoint()
    val base = scale / 100L * 15L
    for (_ <- 1 to iterations)
      ranks = round(withDeg, ranks, base, useBroadcast).localCheckpoint()
    ranks
  }

  /** One rank iteration, un-checkpointed — exposed so specs can assert
    * the physical join strategy (the outer loop's checkpoint flattens the
    * plan to a LogicalRDD scan, hiding the join from inspection).
    *
    * Checkpointed frames carry no stats, so without an explicit hint
    * Catalyst planned a sort-merge join and re-exchanged every edge every
    * round (measured 5× the total edge bytes at sf0.1) — hence the
    * explicit broadcast below the gate, explicit co-partitioning above it.
    */
  private[graft] def round(
      withDeg: DataFrame, ranks: DataFrame, base: Long,
      useBroadcast: Boolean): DataFrame =
    withDeg
      .join(if (useBroadcast) broadcast(ranks) else ranks,
        col("src") === col("vertex"))
      .select(col("dst"), expr("r div outdeg").as("c"))
      .groupBy(col("dst"))
      .agg(expr(s"$base + (85 * sum(c)) div 100").as("r"))
      .select(col("dst").as("vertex"), col("r"))
}
