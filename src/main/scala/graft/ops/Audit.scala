package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity audit: per foreign-key edge, how many child
  * rows point at a parent key that doesn't exist. The data-quality
  * pre-flight a pipeline runs after ingesting a multi-table drop —
  * orphaned facts silently vanish from inner-join analytics, so the
  * audit makes the loss visible BEFORE queries run.
  *
  * Scale shape: each edge is one left join of the child's key column
  * (a single-column projection — the scan prunes everything else)
  * against the DISTINCT parent keys, counted with map-side partial
  * aggregation. Edges are independent single-pass jobs unioned into one
  * report; nothing is quadratic, and the parent side is the smaller
  * dimension table in every TPC-H-shaped schema.
  */
object Audit {

  /** One report row per edge: (edge, n_rows, n_orphans).
    *
    * @param edges (label, child, fkCol, parent, pkCol) per FK edge
    */
  def fkOrphans(
      edges: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame =
    edges.map { case (label, child, fkCol, parent, pkCol) =>
      child.select(col(fkCol).as("__fk"))
        .join(parent.select(col(pkCol).as("__pk")).distinct(),
          col("__fk") === col("__pk"), "left")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("__pk").isNull, 1L).otherwise(0L)).as("n_orphans"))
        .select(lit(label).as("edge"), col("n_rows"), col("n_orphans"))
    }.reduce(_ unionAll _)
}
