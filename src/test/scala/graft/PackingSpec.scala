package graft

import org.apache.spark.sql.functions._

import graft.ops.Packing

class PackingSpec extends SparkSessionSpec {
  import spark.implicits._

  private def pack(rows: Seq[(Long, String, Long)], capacity: Long,
      shards: Int = 1): Seq[(Long, String, Long, Long, Long)] = {
    val df = rows.toDF("doc_id", "lang", "n")
    Packing.nextFitPack(df, col("n"), "doc_id", "lang", capacity, shards)
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)
  }

  test("next-fit recurrence: bins open exactly on overflow, in id order") {
    // capacity 10: [4, 5] fill bin 0; 3 overflows -> bin 1; [3, 4] stay;
    // 9 overflows -> bin 2
    val out = pack(Seq(
      (1L, "en", 4L), (2L, "en", 5L), (3L, "en", 3L),
      (4L, "en", 3L), (5L, "en", 4L), (6L, "en", 9L)), capacity = 10)
    assert(out.map(r => r._1 -> r._4) ===
      Seq(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 6L -> 2L))
  }

  test("oversized document sits alone in its own bin") {
    val out = pack(Seq(
      (1L, "en", 3L), (2L, "en", 50L), (3L, "en", 3L)), capacity = 10)
    assert(out.map(_._4) === Seq(0L, 1L, 2L))
  }

  test("groups and shards pack independently; every doc packed once") {
    val rows = (1L to 100L).map(i =>
      (i, if (i % 2 == 0) "en" else "de", (i % 7) + 1))
    val out = pack(rows, capacity = 16, shards = 4)
    assert(out.length === 100)
    assert(out.map(_._1).toSet === (1L to 100L).toSet)
    // shard is the deterministic id hash
    assert(out.forall(r => r._3 === r._1 % 4))
    // no bin within a cell exceeds capacity unless it holds one oversize
    // doc (none here, counts <= 8 <= 16)
    val over = out.groupBy(r => (r._2, r._3, r._4))
      .filter { case (_, ds) => ds.map(_._5).sum > 16 }
    assert(over.isEmpty, s"overfull bins: ${over.keys}")
    // bins are contiguous from 0 within each cell
    out.groupBy(r => (r._2, r._3)).foreach { case (_, ds) =>
      val bins = ds.map(_._4).distinct.sorted
      assert(bins === (0L until bins.length).toSeq)
    }
  }
}
