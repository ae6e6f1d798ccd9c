package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means TRAINING — fixed-point-integer, bit-exact
  * across engines (the q30/PageRank discipline applied to embedding
  * space; reference workloads: the iterative-refinement class its MR
  * engine targets, e.g. `/root/reference/README.md` crawler/indexer
  * loops).
  *
  * Float Lloyd's can never hash-match an oracle: the per-cell mean is an
  * IEEE sum whose order every shuffle changes. Here each coordinate is
  * quantized ONCE to a nonnegative integer (`floor((x + shift) · scale)` —
  * the shift drops out of every distance, since L2 compares coordinate
  * DIFFERENCES), so cell sums are associative-commutative integer adds,
  * the centroid update is an exact integer division, and a SQL engine
  * can replay the entire training run round for round (v14's unrolled
  * DuckDB oracle).
  *
  * Determinism end-to-end:
  *  - seeds: one per md5-bucket of the id (`k` buckets), the bucket's
  *    (md5(id), id)-minimal row — a single partial aggregation, no
  *    global sort, no RNG;
  *  - assignment: argmin integer L2², ties to the lowest cell id;
  *  - update: per-cell coordinate mean `sum div n`; an EMPTY cell keeps
  *    its previous centroid.
  *
  * Scale shape (the 100 TB story): the quantized corpus is materialized
  * once (`localCheckpoint`) and never re-shuffled. Each round pays
  *  (1) a map-side assignment against the k·dim centroid LITERAL
  *      (broadcast-by-construction — centroids ride the closure, the
  *      corpus never moves), and
  *  (2) ONE partially-aggregated (cell, dim) shuffle whose post-combine
  *      volume is k·dim rows per partition — independent of corpus size —
  *      followed by a k·dim-row driver collect (the same bounded-model
  *      collect every Lloyd implementation, incl. Spark MLlib, performs).
  * Rounds are fixed, not convergence-tested: deterministic cost, and the
  * oracle can unroll the same count.
  *
  * Overflow contract: coordinates quantize to ≤ maxCoord = (maxAbs +
  * shift)·scale; a distance term is ≤ dim·maxCoord², a cell sum is
  * ≤ n·maxCoord — both must fit a long. With the defaults (scale 10⁶,
  * |x| ≤ 1) that holds to dim ~10⁶ and n ~10¹² rows per cell.
  *
  * @param emb    (idCol: castable-to-long, vecCol: array<float/double>)
  * @param shift  must make every coordinate nonnegative after shifting —
  *               keeps the centroid division in the nonneg domain where
  *               floor- and truncating-division agree across engines
  * @return (id, cell, dist2): final-round assignment and its integer L2²
  *         distance to the trained centroid
  */
object KMeansTrain {

  def lloydAssign(
      emb: DataFrame, k: Int, rounds: Int,
      idCol: String = "id", vecCol: String = "vec",
      scale: Double = 1000000.0, shift: Double = 1.0): DataFrame = {
    require(k >= 1 && k <= 4096, s"k must be in [1, 4096], got $k")
    require(rounds >= 0 && rounds <= 50,
      s"rounds must be in [0, 50], got $rounds")

    // quantize once; widen first so the per-round narrow work is spread
    // even when the scan is a single row group (dev-data artifact)
    val q = widen(emb.select(col(idCol).cast("long").as("id"),
        transform(col(vecCol), x =>
          floor((x.cast("double") + lit(shift)) * lit(scale)).cast("long"))
          .as("qv")))
      .localCheckpoint()

    val mk = md5(col("id").cast("string"))
    val bucket = (conv(substring(mk, 1, 8), 16, 10).cast("long") % k)
      .cast("int")
    // seed = (md5, id)-minimal row per bucket: min(struct) is partially
    // aggregable (k rows cross the exchange), the qv fetch is a k-row join
    val seedIds = q
      .select(col("id"), bucket.as("cell"), mk.as("mk"))
      .groupBy("cell")
      .agg(min(struct(col("mk"), col("id"))).as("m"))
      .select(col("cell"), col("m.id").as("id"))
    var cents: Array[(Int, Array[Long])] = seedIds
      .join(q, "id")
      .select(col("cell"), col("qv"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1)

    // argmin integer L2² against the current centroid literal; ties to the
    // lowest cell id (cents is cell-ascending, array_position takes the
    // FIRST minimum)
    def withAssignment(): DataFrame = {
      val cellLit = typedlit(cents.map(_._1).toSeq)
      val centLit = typedlit(cents.map(_._2.toSeq).toSeq)
      val dists = transform(centLit, c =>
        aggregate(zip_with(col("qv"), c, (a, b) => (a - b) * (a - b)),
          lit(0L), (s, x) => s + x))
      q.withColumn("__d", dists)
        .withColumn("__pos",
          array_position(col("__d"), array_min(col("__d"))).cast("int"))
        .withColumn("cell", element_at(cellLit, col("__pos")))
        .withColumn("dist2", element_at(col("__d"), col("__pos")))
    }

    for (_ <- 1 to rounds) {
      val upd = withAssignment()
        .select(col("cell"), posexplode(col("qv")).as(Seq("i", "v")))
        .groupBy("cell", "i")
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .collect()
      val byCell = upd.groupBy(_.getInt(0))
      cents = cents.map { case (cell, prev) =>
        byCell.get(cell) match {
          case Some(rows) =>
            val next = prev.clone()
            rows.foreach { r =>
              next(r.getInt(1)) = Math.floorDiv(r.getLong(2), r.getLong(3))
            }
            (cell, next)
          case None => (cell, prev) // empty cell keeps its centroid
        }
      }
    }

    withAssignment().select(col("id"), col("cell"), col("dist2"))
  }
}
