package graft

import org.apache.spark.sql.functions._

import graft.ops.KMeansTrain

/** Differential tests for the distributed Lloyd's trainer: an
  * INDEPENDENT naive replay of the same integer recurrence (the
  * PageRankSpec idiom), partition invariance, and the degenerate
  * empty-cell / zero-round contracts.
  */
class KMeansTrainSpec extends SparkSessionSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Naive driver-side replay of the documented recurrence. */
  private def replay(
      pts: Seq[(Long, Array[Float])], k: Int, rounds: Int,
      scale: Double = 1000000.0, shift: Double = 1.0)
      : Map[Long, (Int, Long)] = {
    val q = pts.map { case (id, v) =>
      id -> v.map(x => math.floor((x.toDouble + shift) * scale).toLong)
    }
    val mk = q.map { case (id, _) => id -> md5hex(id.toString) }.toMap
    def bucket(id: Long): Int =
      (java.lang.Long.parseLong(mk(id).substring(0, 8), 16) % k).toInt
    val seeds = q.groupBy { case (id, _) => bucket(id) }
      .map { case (cell, rows) =>
        cell -> rows.minBy { case (id, _) => (mk(id), id) }._2.clone()
      }
    var cents = seeds.toArray.sortBy(_._1)
    def assign(qv: Array[Long]): (Int, Long) =
      cents.map { case (cell, c) =>
        val d2 = qv.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
        (cell, d2)
      }.minBy { case (cell, d2) => (d2, cell) }
    for (_ <- 1 to rounds) {
      val byCell = q.groupBy { case (_, qv) => assign(qv)._1 }
      cents = cents.map { case (cell, prev) =>
        byCell.get(cell) match {
          case Some(rows) =>
            val dim = prev.length
            val next = Array.tabulate(dim) { i =>
              Math.floorDiv(rows.map(_._2(i)).sum, rows.size.toLong)
            }
            (cell, next)
          case None => (cell, prev)
        }
      }
    }
    q.map { case (id, qv) => id -> assign(qv) }.toMap
  }

  // 40 points in 4 planted blobs (deterministic, no RNG)
  private def blobs: Seq[(Long, Array[Float])] =
    (0 until 40).map { i =>
      val c = i % 4
      val base = Array(0.4f * c - 0.6f, 0.3f * c - 0.45f, -0.2f * c + 0.3f)
      (i.toLong, base.map(x => x + 0.001f * (i / 4)))
    }

  test("lloydAssign matches the independent integer replay") {
    val df = blobs.toDF("vec_id", "embedding")
    val got = KMeansTrain.lloydAssign(df, k = 4, rounds = 3,
        idCol = "vec_id", vecCol = "embedding")
      .as[(Long, Int, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got === replay(blobs, k = 4, rounds = 3))
  }

  test("result is invariant to input partitioning") {
    val a = KMeansTrain.lloydAssign(
      blobs.toDF("vec_id", "embedding").repartition(1),
      k = 3, rounds = 2, idCol = "vec_id", vecCol = "embedding")
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    val b = KMeansTrain.lloydAssign(
      blobs.toDF("vec_id", "embedding").repartition(7),
      k = 3, rounds = 2, idCol = "vec_id", vecCol = "embedding")
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(a === b)
  }

  test("k beyond distinct md5-buckets: cells = buckets present, all rows assigned") {
    val tiny = blobs.take(3)
    val got = KMeansTrain.lloydAssign(tiny.toDF("vec_id", "embedding"),
        k = 8, rounds = 2, idCol = "vec_id", vecCol = "embedding")
      .as[(Long, Int, Long)].collect()
    assert(got.length === 3)
    assert(got === got.sortBy(_._1).sortBy(_._1)) // sanity: stable collect
    assert(got.map(_._1).toSet === tiny.map(_._1).toSet)
    assert(got.map(r => r._1 -> (r._2, r._3)).toMap ===
      replay(tiny, k = 8, rounds = 2))
  }

  test("rounds = 0 assigns against the raw seeds") {
    val got = KMeansTrain.lloydAssign(blobs.toDF("vec_id", "embedding"),
        k = 4, rounds = 0, idCol = "vec_id", vecCol = "embedding")
      .as[(Long, Int, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got === replay(blobs, k = 4, rounds = 0))
    // a seed's own distance to its centroid is zero
    val seedCells = got.filter { case (_, (_, d2)) => d2 == 0L }
    assert(seedCells.nonEmpty)
  }
}
