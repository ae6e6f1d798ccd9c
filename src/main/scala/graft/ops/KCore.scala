package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by parallel peeling — the fifth member of the
  * iterative-graph family (PageRank q30, components d06, triangles q35,
  * BFS q51; the reference's `mr.exec` re-invocation loop per SURVEY
  * §2.6). The k-core is the unique maximal subgraph in which every
  * vertex has degree ≥ k — the standard "dense backbone" extraction for
  * community seeding and graph cleaning.
  *
  * Algorithm: simultaneous peeling. Each round removes EVERY current
  * vertex whose surviving degree is < k, then decrements its neighbors.
  * Peeling is confluent (any removal schedule reaches the same unique
  * fixpoint), so this batch schedule, a sequential schedule, and the
  * oracle's full-recompute schedule all agree — that is what makes the
  * operator oracle-able despite being iterative.
  *
  * Scale shape (the q30/q51 co-partitioning discipline): the edge list
  * is hash-partitioned by src ONCE and checkpointed in that layout.
  * Each round's work is keyed by the DOOMED set — the vertices removed
  * this round — which joins the edge table on its partitioning key, so
  * only the doomed side (small, shrinking) ever exchanges; the edge
  * set, the 100 TB object, never re-shuffles after setup. Degrees are
  * maintained DECREMENTALLY (deg −= removed-neighbor count) rather than
  * recomputed, so per-round cost is O(edges incident to the doomed
  * set), not O(E) — the standard peeling optimization. The degree table
  * is |V|-sized and localCheckpointed per round, keeping every
  * iteration's plan rooted at materialized partitions.
  */
object KCore {

  /** Vertices of the k-core of a DIRECTED edge list (feed both
    * orientations for an undirected graph; self-loops dropped,
    * duplicate edges collapsed). Output: (node, core_degree) — the
    * vertex's degree WITHIN the core (≥ k by construction). Empty when
    * the graph has no k-core.
    *
    * `maxRounds` bounds the driver loop (each round is O(1) Spark
    * actions); peeling a graph with max core number c needs at most
    * O(|V|) rounds in theory but converges in a handful in practice —
    * the result is the true k-core only if a fixpoint is reached, so
    * the cap is a guard, not a tuning knob.
    */
  def kCore(
      edges: DataFrame, k: Int, maxRounds: Int = 64,
      srcCol: String = "src", dstCol: String = "dst",
      broadcastMaxVertices: Long = 2L * 1000 * 1000): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val e = edges
      .select(col(srcCol).cast("long").as("__src"),
        col(dstCol).cast("long").as("__dst"))
      .filter(col("__src") =!= col("__dst"))
      .distinct()
      // src-keyed layout, materialized once: every round's doomed⋈edges
      // join satisfies its distribution requirement from the checkpoint
      .repartition(col("__src"))
      .localCheckpoint()
    var deg = e.groupBy(col("__src").as("node"))
      .agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    // the q30 regime gate, read off the already-materialized degree
    // table (bounded 1-row collect): below it the node-bounded doomed
    // set BROADCASTS into the decrement join, so the edge table is
    // neither re-sorted nor re-exchanged per round (a stat-less
    // checkpoint otherwise sort-merge-joins and pays a full edge sort
    // every round — guide §3.1); the vertex-sized bookkeeping joins
    // broadcast their small sides the same way
    val useBroadcast = deg.count() <= broadcastMaxVertices
    var round = 0
    var done = false
    while (round < maxRounds && !done) {
      val doomed = deg.filter(col("deg") < k)
        .select(col("node")).localCheckpoint()
      if (doomed.isEmpty) done = true
      else {
        // each removed vertex decrements its still-alive neighbors; a
        // neighbor removed in the SAME round is dropped by the
        // anti-join anyway, so over-decrementing it is harmless
        val dec = (if (useBroadcast) broadcast(doomed) else doomed)
          .join(e, col("node") === col("__src"))
          .groupBy(col("__dst").as("__n"))
          .agg(count(lit(1)).as("__dec"))
        deg = deg
          .join(if (useBroadcast) broadcast(doomed) else doomed,
            Seq("node"), "left_anti")
          .join(if (useBroadcast) broadcast(dec) else dec,
            col("node") === col("__n"), "left")
          .select(col("node"),
            (col("deg") - coalesce(col("__dec"), lit(0L))).as("deg"))
          .localCheckpoint()
      }
      round += 1
    }
    // at a fixpoint this filter is a no-op (everything survived with
    // deg >= k); under a premature cap it keeps the output contract
    // (every reported degree >= k) even though the set may be a
    // superset of the true core
    deg.filter(col("deg") >= k)
      .select(col("node"), col("deg").as("core_degree"))
  }
}
