package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search and embedding near-dup detection.
  *
  * Two paths, same contract:
  *  - [[bruteForceTopK]] — exact baseline: broadcast the (small) query set
  *    against the corpus, one narrow pass, per-query top-k via window.
  *    At 100 TB the corpus side stays partitioned; only queries move.
  *  - [[lshTopK]] — scale path: random-hyperplane LSH buckets corpus and
  *    queries; candidates are generated only inside (multi-probed)
  *    buckets, so the scored pair count drops from |Q|·|C| to
  *    |Q|·bucket-size. Recall is tunable via planes/probes.
  *
  * Embedding near-dups ([[cosineNearDupPairs]]) reuse the bucket join —
  * the same one-shuffle shape as MinHash dedup (see [[Dedup]]).
  */
object Similarity {

  /** Exact top-k neighbors for each query row.
    *
    * @param corpus  (id, vec) — the big side; stays distributed
    * @param queries (qid, vec) — small; gets broadcast
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "id", vecCol: String = "vec",
      qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col(idCol) =!= col(qidCol))
      .withColumn("sim", cosine(col(vecCol), col(qvecCol)))
    val w = Window.partitionBy(col(qidCol))
      .orderBy(col("sim").desc, col(idCol).asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(idCol).as("neighbor_id"),
        col("rank"), round(col("sim"), 6).as("sim"))
  }

  /** LSH-bucketed ANN: hyperplane sign buckets + multiprobe.
    * Each query looks in every bucket within Hamming distance `probeBits`
    * of its own (1 + n + n(n-1)/2 buckets for probeBits=2); candidates are
    * scored exactly, top-k per query.
    *
    * Tuning: bucket collision probability per plane is 1 − θ/π. For
    * tight near-dup clusters (cosine ≥ 0.9, the 100 TB dedup case) use
    * 8–16 planes, probeBits 1. For diffuse corpora (this test corpus:
    * top-10 cosine ≈ 0.3–0.5) fewer planes + probeBits 2 keeps recall up.
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      nPlanes: Int = 4, probeBits: Int = 2, dim: Int = 64,
      idCol: String = "id", vecCol: String = "vec",
      qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    val planes = randomPlanes(nPlanes, dim)
    val cb = corpus.withColumn("bucket", hyperplaneBucket(col(vecCol), planes))
    val qBuckets =
      queries.withColumn("qbucket0", hyperplaneBucket(col(qvecCol), planes))
    val flips: Seq[Long] =
      Seq(0L) ++
        (if (probeBits >= 1) (0 until nPlanes).map(1L << _) else Nil) ++
        (if (probeBits >= 2)
          for { i <- 0 until nPlanes; j <- (i + 1) until nPlanes }
            yield (1L << i) | (1L << j)
        else Nil)
    val probeArr = array(flips.map(f => col("qbucket0").bitwiseXOR(lit(f))): _*)
    val qb = qBuckets
      .withColumn("bucket", explode(probeArr))
      .drop("qbucket0")
    val scored = cb.join(qb, Seq("bucket"))
      .filter(col(idCol) =!= col(qidCol))
      .dropDuplicates(qidCol, idCol)
      .withColumn("sim", cosine(col(vecCol), col(qvecCol)))
    val w = Window.partitionBy(col(qidCol))
      .orderBy(col("sim").desc, col(idCol).asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(idCol).as("neighbor_id"),
        col("rank"), round(col("sim"), 6).as("sim"))
  }

  /** Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥
    * threshold) via hyperplane-bucket blocking + exact verification.
    * Identical/near-identical vectors always share their exact bucket, so
    * true dups are never missed by the blocking for thresholds near 1.
    */
  def cosineNearDupPairs(
      corpus: DataFrame, threshold: Double,
      nPlanes: Int = 8, dim: Int = 64,
      idCol: String = "id", vecCol: String = "vec"): DataFrame = {
    val planes = randomPlanes(nPlanes, dim)
    val b = corpus
      .withColumn("bucket", hyperplaneBucket(col(vecCol), planes))
      .select(col(idCol).as("id"), col(vecCol).as("vec"), col("bucket"))
    b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .withColumn("sim", cosine(col("a.vec"), col("b.vec")))
      .filter(col("sim") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(col("sim"), 6).as("sim"))
  }
}
