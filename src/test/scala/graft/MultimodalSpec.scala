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

  test("qualityGate: each rule fires alone, composes, and passes clean rows") {
    val features = Seq(
      // doc_id, media_type, n_bytes, width, height, n_frames
      (1L, "image", 1000L, 224, 224, 0),   // clean
      (2L, "image", 10L, 224, 224, 0),     // tiny_payload only
      (3L, "image", 1000L, 16, 100, 0),    // tiny_dims (100 <= 8*16, no aspect)
      (4L, "image", 1000L, 600, 40, 0),    // extreme_aspect (600 > 8*40=320)
      (5L, "video", 1000L, 224, 224, 1),   // too_few_frames
      (6L, "audio", 10L, 16, 16, 1),       // audio: ONLY payload rule applies
      (7L, "video", 10L, 16, 100, 1)       // three rules compose, fixed order
    ).toDF("doc_id", "media_type", "n_bytes", "width", "height", "n_frames")
    val got = Multimodal.qualityGate(features)
      .select("doc_id", "reasons", "kept")
      .as[(Long, String, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === (("", true)))
    assert(got(2L) === (("tiny_payload", false)))
    assert(got(3L) === (("tiny_dims", false)))
    assert(got(4L) === (("extreme_aspect", false)))
    assert(got(5L) === (("too_few_frames", false)))
    assert(got(6L) === (("tiny_payload", false)))
    assert(got(7L) === (("tiny_payload,tiny_dims,too_few_frames", false)))
  }

  test("fkOrphans: planted orphans counted per edge, clean edge reads zero") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq((10L, 1L), (11L, 2L), (12L, 99L), (13L, 98L), (14L, 3L))
      .toDF("id", "fk")
    val got = graft.ops.Audit.fkOrphans(Seq(
        ("child->parent", child, "fk", parent, "pk"),
        ("clean", parent, "pk", parent, "pk")))
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(("child->parent", 5L, 2L), ("clean", 3L, 0L)))
  }
}
