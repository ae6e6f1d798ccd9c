package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting — with PageRank (q30) and connected
  * components (d06), the third canonical iterative/graph MR workload
  * (the reference's engine family was built for exactly these
  * fan-out/shuffle shapes).
  *
  * Algorithm: node-iterator++ (degree-ordered wedge check).
  *  1. undirected edges dedup to (lo, hi);
  *  2. every edge is DIRECTED from its (degree, id)-smaller endpoint to
  *     the larger — a total order, so each triangle has exactly one
  *     "pivot" node with both out-edges;
  *  3. wedges (v, w) from each pivot's out-neighbor pairs join the
  *     directed edge set; a hit is a triangle, counted once.
  *
  * Scale shape: directing by degree bounds every out-adjacency at
  * O(√|E|) (a classic result — a node of out-degree d needs d neighbors
  * of degree ≥ d, so d(d+1)/2 ≤ |E|), which bounds the wedge blow-up per
  * pivot at O(|E|) total ~ the optimal sequential work. All joins are
  * shuffles on node/pair keys; nothing is collected to the driver. The
  * wedge self-join groups by pivot, so one mega-degree node after
  * direction-capping cannot exist by the √|E| argument — no salting
  * needed where PageRank/components needed none either.
  */
object Triangles {

  /** Count triangles in an undirected graph given as an edge list (any
    * orientation, duplicates and self-loops tolerated — they are
    * normalized away). Returns a single row: (n_triangles).
    */
  def triangleCount(
      edges: DataFrame, srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("lo"),
        greatest(col(srcCol), col(dstCol)).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
    val deg = e.select(col("lo").as("v")).unionAll(e.select(col("hi").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    // direct each edge from the (deg, id)-smaller endpoint to the larger
    val directed = e
      .join(deg.withColumnRenamed("v", "lo").withColumnRenamed("deg", "dlo"), "lo")
      .join(deg.withColumnRenamed("v", "hi").withColumnRenamed("deg", "dhi"), "hi")
      .select(
        when(col("dlo") < col("dhi") ||
          (col("dlo") === col("dhi") && col("lo") < col("hi")), col("lo"))
          .otherwise(col("hi")).as("u"),
        when(col("dlo") < col("dhi") ||
          (col("dlo") === col("dhi") && col("lo") < col("hi")), col("hi"))
          .otherwise(col("lo")).as("v"))
    // wedges: ordered out-neighbor pairs of each pivot
    val a = directed.select(col("u"), col("v").as("n1"))
    val b = directed.select(col("u"), col("v").as("n2"))
    val wedges = a.join(b, Seq("u")).filter(col("n1") < col("n2"))
    // a wedge closes iff (n1, n2) is itself an edge (directed either way
    // — compare as the unordered (lo, hi) pair)
    val closing = e.select(col("lo").as("n1"), col("hi").as("n2"))
    wedges.join(closing, Seq("n1", "n2"))
      .agg(count(lit(1)).as("n_triangles"))
  }
}
