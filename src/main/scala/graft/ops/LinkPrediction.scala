package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Neighborhood link-prediction scores over an undirected graph — the
  * classic trio (common neighbors, Jaccard, Adamic–Adar) for part pairs
  * not yet connected. The reference has no graph surface; this is the
  * recommender/graph-completion extension in the q35 wedge-join
  * discipline.
  *
  * Scale shape: wedges pivot through the shared neighbor z — per-pivot
  * cost ~deg(z)², never corpus-quadratic — and pivots above
  * `maxPivotDeg` are EXCLUDED: the standard hub cap (a hub's AA weight
  * 1/ln(deg) is ≈ noise while its deg² wedge fan-out dominates), which
  * makes cn/jaccard defined over non-hub pivots by contract. Each AA
  * term is round-6 of one libm ln summed as exact DECIMAL (the t11
  * cross-row double-sum discipline); the ScaleSmoke gate times this
  * shape at two factors (disjoint-subgraph scaling must stay linear).
  */
object LinkPrediction {

  /** edges: undirected (lo, hi), distinct, lo < hi, long-typed.
    * Output: (part_a, part_b, cn, jaccard, adamic_adar) for non-edges
    * with ≥ minCommon shared non-hub neighbors.
    */
  def neighborScores(
      edges: DataFrame, maxPivotDeg: Int = 128,
      minCommon: Int = 15): DataFrame = {
    require(maxPivotDeg >= 2, s"maxPivotDeg must be >= 2, got $maxPivotDeg")
    require(minCommon >= 1, s"minCommon must be >= 1, got $minCommon")
    val deg = edges.select(col("lo").as("v"))
      .unionAll(edges.select(col("hi").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val piv = edges.select(col("lo").as("z"), col("hi").as("n"))
      .unionAll(edges.select(col("hi").as("z"), col("lo").as("n")))
      .join(deg.select(col("v").as("z"), col("d").as("__dz")), Seq("z"))
      .filter(col("__dz") <= maxPivotDeg)
    val cand = piv.as("p").join(piv.as("q"), Seq("z"))
      .filter(col("p.n") < col("q.n"))
      .select(col("p.n").as("a"), col("q.n").as("b"),
        round(lit(1.0) / log(col("p.__dz").cast("double")), 6)
          .cast(DecimalType(18, 6)).as("__aa"))
    val scored = cand.groupBy("a", "b")
      .agg(count(lit(1)).as("cn"),
        sum(col("__aa")).cast(DecimalType(38, 6)).as("__aas"))
      .filter(col("cn") >= minCommon)
    scored
      .join(edges, scored("a") === edges("lo") && scored("b") === edges("hi"),
        "left_anti")
      .join(deg.select(col("v").as("a"), col("d").as("__da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("__db")), Seq("b"))
      .select(col("a").as("part_a"), col("b").as("part_b"), col("cn"),
        round(col("cn").cast("double") /
          (col("__da") + col("__db") - col("cn")).cast("double"), 6)
          .as("jaccard"),
        col("__aas").cast("double").as("adamic_adar"))
  }
}
