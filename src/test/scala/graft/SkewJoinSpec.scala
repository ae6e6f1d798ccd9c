package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SkewJoin

class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = Engine.session(master = "local[4]")
  import spark.implicits._

  test("salted join == plain join on a pathologically skewed key") {
    // 90% of probe rows share one key — the shape AQE can't split
    val probe = (1 to 5000).map { i =>
      (if (i % 10 == 0) i.toLong else 7L, s"p$i")
    }.toDF("k", "pv")
    val build = Seq((7L, "hot"), (10L, "b10"), (20L, "b20"), (999L, "none"))
      .toDF("k", "bv")
    val plain = probe.join(build, Seq("k"))
      .select("k", "pv", "bv").as[(Long, String, String)].collect().toSet
    val salted = SkewJoin.saltedJoin(probe, build, Seq("k"), salt = 8)
      .select("k", "pv", "bv").as[(Long, String, String)].collect().toSet
    assert(salted === plain)
    assert(plain.size > 4000)
  }

  test("AQE's own skew split engages on the hot key and agrees with saltedJoin") {
    // the scaladoc's decision note, executed: on a single-pathological-
    // key corpus, AQE splits the skewed SMJ partition by map-output
    // ranges (SortMergeJoin(skew=true)) — same rows as the salted form.
    // Thresholds are lowered so the test fixture crosses the size bars
    // production crosses naturally.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force the SMJ
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val probe = (1 to 50000).map { i =>
        (if (i % 10 == 0) i.toLong else 7L, s"payload-$i-xxxxxxxxxxxxxxxxxxxx")
      }.toDF("k", "pv")
      val build = Seq((7L, "hot"), (10L, "b10"), (20L, "b20"), (999L, "none"))
        .toDF("k", "bv")
      val plain = probe.join(build, Seq("k")).select("k", "pv", "bv")
      // collect THIS queryExecution (an .as[...] would plan a new one
      // and leave this plan un-finalized by AQE)
      val rows = plain.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      val plan = plain.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        "AQE did not engage its skew split on the hot key")
      assert(plan.contains("skewed"), "no skewed AQEShuffleRead in the plan")
      val salted = SkewJoin.saltedJoin(probe, build, Seq("k"), salt = 8)
        .select("k", "pv", "bv").as[(Long, String, String)].collect().toSet
      assert(salted === rows)
    } finally saved.foreach { case (k, v) =>
      v match {
        case Some(x) => spark.conf.set(k, x)
        case None => spark.conf.unset(k)
      }
    }
  }

  test("salted join with composite keys and duplicate build rows") {
    val probe = Seq((1L, "a", 10), (1L, "a", 11), (2L, "b", 12)).toDF("k1", "k2", "pv")
    val build = Seq((1L, "a", "x"), (1L, "a", "y"), (2L, "b", "z")).toDF("k1", "k2", "bv")
    val plain = probe.join(build, Seq("k1", "k2"))
      .select("pv", "bv").as[(Int, String)].collect().sorted.toSeq
    val salted = SkewJoin.saltedJoin(probe, build, Seq("k1", "k2"), salt = 4)
      .select("pv", "bv").as[(Int, String)].collect().sorted.toSeq
    assert(salted === plain) // duplicates preserved (multiset equality)
  }
}
