package graft

import org.apache.spark.sql.functions._
import graft.Engine.table
import graft.mm.Multimodal

class MultimodalSpec extends SparkSessionSpec {
  import spark.implicits._

  test("stub decoder is deterministic and byte-derived") {
    val f1 = Multimodal.StubDecoder.decode("image", "hello world".getBytes)
    val f2 = Multimodal.StubDecoder.decode("image", "hello world".getBytes)
    assert(f1 === f2)
    assert(f1.width === 11 % 640 + 16)
    val sum = "hello world".getBytes.map(_ & 0xff).sum
    assert(math.abs(f1.brightness - sum.toDouble / 11) < 1e-12)
  }

  test("decodeFeatures: full mapPartitions plumbing over real table") {
    val media = Multimodal.asMediaTable(table(spark, sfDir, "documents"))
    val feats = Multimodal.decodeFeatures(spark, media)
    val rows = feats.collect()
    assert(rows.length === 500)
    assert(rows.forall(r => r.width >= 16 && r.width < 656))
    assert(rows.forall(r => r.n_frames >= 1 && r.n_frames <= 16))
    assert(rows.forall(r => r.brightness > 0))
    // media_type fan-out is stable
    assert(rows.filter(_.doc_id % 3 == 0).forall(_.media_type == "image"))
  }

  test("frame sampling: stride over per-video frame counts") {
    val media = Multimodal.asMediaTable(table(spark, sfDir, "documents"))
    val frames = Multimodal.sampleFrames(media, stride = 4)
    val byDoc = frames.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("n_frames").as("nf"))
      .select("n", "nf").as[(Long, Int)].collect()
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (n, nf) =>
      assert(n === (nf + 3) / 4) // ceil(nf / stride)
    }
  }

  test("media dedup groups identical payloads, keeper = min id") {
    import org.apache.spark.sql.functions.col
    val d = graft.Engine.table(spark, sfDir, "documents")
    val planted = d.unionAll(d.withColumn("doc_id", col("doc_id") + 10000))
    val groups = Multimodal.mediaDedupGroups(Multimodal.asMediaTable(planted))
    val n = d.count()
    // every original has exactly one planted copy; keeper is the original
    assert(groups.count() <= n)
    val twoPlus = groups.filter(col("n_copies") >= 2)
    assert(twoPlus.count() === groups.count()) // all groups have the copy
    assert(groups.filter(col("keeper_id") >= 10000).count() === 0)
  }
}
