package graft

import org.apache.spark.sql.functions._

import graft.Engine.table
import graft.ops.Sampling

class SamplingSpec extends SparkSessionSpec {
  import spark.implicits._

  test("split membership is stable under repartitioning and appends") {
    val docs = table(spark, sfDir, "documents").select("doc_id")
    val before = Sampling.split(docs, "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    // same rows, different physical layout → identical membership
    val after = Sampling.split(docs.repartition(13), "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(after === before)
    // appending new rows must not move existing rows between splits
    val appended = Sampling.split(
      docs.unionAll(Seq(900001L, 900002L).toDF("doc_id")), "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    before.foreach { case (id, s) => assert(appended(id) === s) }
  }

  test("split fractions are close to the requested bands") {
    val docs = table(spark, sfDir, "documents")
    val n = docs.count().toDouble
    val counts = Sampling.split(docs, "doc_id")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(math.abs(counts("train") / n - 0.8) < 0.06)
    assert(math.abs(counts("val") / n - 0.1) < 0.05)
    assert(math.abs(counts("test") / n - 0.1) < 0.05)
  }

  test("stratified sample takes the same rate from every stratum") {
    val docs = table(spark, sfDir, "documents").select("doc_id", "lang")
    val perLang = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val sampled = Sampling.stratifiedSample(docs, "lang", "doc_id", 1, 10)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    perLang.foreach { case (lang, n) =>
      val expected = (n + 9) / 10 // ceil: every stratum represented
      assert(sampled.getOrElse(lang, 0L) === expected, s"stratum $lang")
    }
  }

  test("temperature sample: sqrt-proportional quotas upweight small domains") {
    val docs = table(spark, sfDir, "documents").select("doc_id", "lang")
    val perLang = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val isqrt = perLang.map { case (l, n) => l -> math.sqrt(n.toDouble).toLong }
    val ss = isqrt.values.sum
    val sampled = Sampling.temperatureSample(docs, "lang", "doc_id", target = 200)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // exact integer quota per domain, capped by domain size
    perLang.foreach { case (lang, n) =>
      val quota = math.min(200L * isqrt(lang) / ss, n)
      assert(sampled.getOrElse(lang, 0L) === quota, s"domain $lang")
    }
    // τ = 0.5 property: sampled share of a SMALL domain exceeds its raw
    // share (upweighting), for the smallest vs largest observed domain
    val (small, nSmall) = perLang.minBy(_._2)
    val (big, nBig) = perLang.maxBy(_._2)
    if (nSmall < nBig) {
      val tot = sampled.values.sum.toDouble
      val n = perLang.values.sum.toDouble
      assert(sampled(small) / tot >= nSmall / n,
        "small domain not upweighted")
      assert(sampled(big) / tot <= nBig / n,
        "big domain not downweighted")
    }
  }

  test("temperature sample membership is stable under repartitioning") {
    val docs = table(spark, sfDir, "documents").select("doc_id", "lang")
    val a = Sampling.temperatureSample(docs, "lang", "doc_id", target = 200)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.temperatureSample(docs.repartition(7), "lang", "doc_id",
        target = 200)
      .select("doc_id").as[Long].collect().toSet
    assert(a === b)
  }

  test("token budget sample: md5-order prefix, per-stratum budget respected") {
    import org.apache.spark.sql.functions.{col, length}
    val docs = table(spark, sfDir, "documents").select("doc_id", "lang", "text")
    val out = Sampling.tokenBudgetSample(
        docs, "lang", "doc_id", length(col("text")), budget = 20000L)
      .as[(Long, String, Long, Long)].collect()
    assert(out.nonEmpty)
    // cum stays within budget and equals the per-stratum running sum of
    // the selected prefix in md5 order
    out.groupBy(_._2).foreach { case (lang, rows) =>
      assert(rows.map(_._4).max <= 20000L, s"stratum $lang over budget")
      val byOrder = rows.sortBy(_._4)
      assert(byOrder.map(_._3).scanLeft(0L)(_ + _).tail.toSeq ===
        byOrder.map(_._4).toSeq, s"stratum $lang cum mismatch")
    }
    // prefix rule: the selected set is closed under the md5 order — the
    // doc JUST past the budget line is excluded, all before it included
    val md5Order = docs
      .select(col("doc_id"), col("lang"),
        org.apache.spark.sql.functions.md5(col("doc_id").cast("string")).as("h"),
        length(col("text")).cast("long").as("n"))
      .as[(Long, String, String, Long)].collect()
    md5Order.groupBy(_._2).foreach { case (lang, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._1))
      val cums = ordered.map(_._4).scanLeft(0L)(_ + _).tail
      val expect = ordered.zip(cums).takeWhile(_._2 <= 20000L).map(_._1._1).toSet
      val got = out.filter(_._2 == lang).map(_._1).toSet
      assert(got === expect, s"stratum $lang membership")
    }
  }

  test("token budget sample membership is stable under repartitioning") {
    import org.apache.spark.sql.functions.{col, length}
    val docs = table(spark, sfDir, "documents").select("doc_id", "lang", "text")
    val a = Sampling.tokenBudgetSample(
        docs, "lang", "doc_id", length(col("text")), 20000L)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.tokenBudgetSample(
        docs.repartition(7), "lang", "doc_id", length(col("text")), 20000L)
      .select("doc_id").as[Long].collect().toSet
    assert(a === b)
  }

  test("negative edges: LCG replay, never a real edge, min-j dedup") {
    val edges = Seq((2L, 3L), (2L, 5L), (4L, 3L)).toDF("src", "dst")
    val got = Sampling.negativeEdges(edges, dstDomainMax = 3L,
        dstOf = h => (h + 1) * 2 + 1, perSrc = 4, seed = 42L)
      .as[(Long, Long, Int)].collect()
    val real = Set((2L, 3L), (2L, 5L), (4L, 3L))
    got.foreach { case (s, d, _) => assert(!real((s, d)), s"real edge ($s,$d)") }
    // independent driver-side replay of the draw + dedup + exclusion
    val M = 2147483648L
    def lcg(x: Long): Long =
      ((x % M * 1103515245L + 12387L) % M * 1103515245L + 12345L) % M
    val want = Seq(2L, 4L).flatMap { s =>
      (0 to 3).map(j => (s, 2 * (lcg(s * 4 + j) % 3 + 1) + 1, j))
    }.groupBy(t => (t._1, t._2)).map(_._2.minBy(_._3))
      .filterNot(t => real((t._1, t._2))).toSet
    assert(got.toSet === want)
    assert(got.nonEmpty)
  }

  test("negative edges are partition-invariant and never exceed perSrc per src") {
    val edges = (1L to 60L).map(i => (i * 2, i % 7 * 2 + 1)).toDF("src", "dst")
    val a = Sampling.negativeEdges(edges.repartition(1), 7L,
      h => (h + 1) * 2 + 1, perSrc = 3).collect().toSet
    val b = Sampling.negativeEdges(edges.repartition(8), 7L,
      h => (h + 1) * 2 + 1, perSrc = 3).collect().toSet
    assert(a === b)
    a.groupBy(_.getLong(0)).values.foreach(rs => assert(rs.size <= 3))
  }

  test("epochPlan: hand-computed quotas, epoch cap, zero-stratum filter") {
    // A: T=10000, s=100; C: T=4, s=2; Z: T=0 (dropped). Σs=102,
    // budget=10200 → quota_A = 10200·100 div 102 = 10000 → 1 epoch,
    // planned 10000; quota_C = 200 → ceil(200/4)=50 capped at 4 →
    // planned min(200, 16) = 16.
    val df = Seq(("A", 10000L), ("C", 4L), ("Z", 0L)).toDF("lang", "nt")
    val got = Sampling.epochPlan(df, "lang", col("nt"), budget = 10200L,
        maxEpochs = 4)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got === Map(
      "A" -> ((10000L, 10000L, 1L, 10000L)),
      "C" -> ((4L, 200L, 4L, 16L))))
    // sum over multiple rows per stratum, order-free
    val multi = Seq(("A", 6000L), ("A", 4000L), ("C", 1L), ("C", 3L))
      .toDF("lang", "nt").repartition(5)
    val got2 = Sampling.epochPlan(multi, "lang", col("nt"), 10200L, 4)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got2 === got)
  }
}
