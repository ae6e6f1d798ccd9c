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
