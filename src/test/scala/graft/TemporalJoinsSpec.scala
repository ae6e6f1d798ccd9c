package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TemporalJoins

class TemporalJoinsSpec extends AnyFunSuite {
  lazy val spark = Engine.session(master = "local[4]")
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("asof join picks latest right row at-or-before left ts, per key") {
    val left = Seq(
      (1L, ts(100), "l1"), (1L, ts(200), "l2"),
      (2L, ts(150), "l3"), (3L, ts(50), "l4"))
      .toDF("k", "ts", "lv")
    val right = Seq(
      (1L, ts(90), "r90"), (1L, ts(150), "r150"), (1L, ts(201), "r201"),
      (2L, ts(150), "r-eq")) // no rows for key 3
      .toDF("k", "ts", "rv")
    val out = TemporalJoins.asofJoin(left, right, "k", "ts", "ts", Seq("rv"))
      .select("lv", "asof_rv").as[(String, String)].collect().toMap
    assert(out === Map(
      "l1" -> "r90",   // 100 → latest ≤ 100 is 90
      "l2" -> "r150",  // 200 → 150 (201 is in the future)
      "l3" -> "r-eq")) // equal ts matches (inclusive)
    // key 3 dropped: no prior right row (inner asof)
  }

  test("asof skew path: one celebrity key, bucketed result == plain result") {
    val rnd = new scala.util.Random(7)
    // 1 hot key with 2000 rows spanning many hours + 3 normal keys
    val left = (1 to 2000).map(i => (1L, ts(i * 60L), s"h$i")) ++
      (1 to 30).map(i => ((i % 3 + 2).toLong, ts(i * 500L), s"n$i"))
    val right = (1 to 400).map(i => (1L, ts(rnd.nextInt(120000).toLong), s"r$i")) ++
      (1 to 10).map(i => ((i % 3 + 2).toLong, ts(i * 700L), s"s$i"))
    val l = left.toDF("k", "ts", "lv")
    val r = right.toDF("k", "ts", "rv")
      // contract: at most one right row per (key, ts)
      .groupBy("k", "ts").agg(max("rv").as("rv"))
    val plain = TemporalJoins.asofJoin(l, r, "k", "ts", "ts", Seq("rv"))
      .collect().map(_.toSeq).toSet
    val bucketed = TemporalJoins.asofJoin(l, r, "k", "ts", "ts", Seq("rv"),
      skewBucket = Some("hour"))
    assert(bucketed.collect().map(_.toSeq).toSet === plain)
    assert(plain.size > 1500)
    // the heavy window must partition by (key, bucket), not the bare key:
    // that is what splits the hot key's rows across tasks
    val phys = bucketed.queryExecution.executedPlan.toString
    assert(phys.contains("hashpartitioning(__k") && phys.contains("__b"),
      s"expected (__k, __b) window partitioning in:\n$phys")
  }

  test("banded range join equals naive non-equi join") {
    val rnd = new scala.util.Random(3)
    val left = Seq.fill(300)(rnd.nextDouble() * 1000).zipWithIndex
      .toDF("v", "lid")
    val right = Seq.fill(40) {
      val lo = rnd.nextDouble() * 900
      (lo, lo + rnd.nextDouble() * 120)
    }.zipWithIndex.map { case ((lo, hi), i) => (lo, hi, i) }
      .toDF("lo", "hi", "rid")
    val banded = TemporalJoins.bandedRangeJoin(
      left, right, col("v"), col("lo"), col("hi"), bandWidth = 100.0)
      .select("lid", "rid").as[(Int, Int)].collect().toSet
    val naive = left.join(right, col("v") >= col("lo") && col("v") <= col("hi"))
      .select("lid", "rid").as[(Int, Int)].collect().toSet
    assert(banded === naive)
    assert(naive.nonEmpty)
  }
}
