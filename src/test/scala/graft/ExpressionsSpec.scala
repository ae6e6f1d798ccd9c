package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions

/** Differential tests: each native codegen expression must agree exactly
  * with the composed-builtin formulation it replaces.
  */
class ExpressionsSpec extends AnyFunSuite {
  lazy val spark = Engine.session(master = "local[4]")
  import spark.implicits._

  test("cosine_sim matches composed dot/norm cosine bit-for-bit") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)(
      (Array.fill(64)(rnd.nextFloat() * 2 - 1),
        Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val got = df.select(
      VectorFunctions.cosine(col("a"), col("b")).as("fast"),
      VectorFunctions.cosineComposed(col("a"), col("b")).as("slow"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("intersect_card_sorted matches size(array_intersect) on sorted sets") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(300)((
      Array.fill(rnd.nextInt(40) + 1)(rnd.nextInt(50).toLong)
        .distinct.sorted.toSeq,
      Array.fill(rnd.nextInt(40) + 1)(rnd.nextInt(50).toLong)
        .distinct.sorted.toSeq))
    val df = rows.toDF("a", "b")
    val got = df.select(
      call_function("intersect_card_sorted", col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("slow"))
      .collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("min_common_sorted matches array_min(array_intersect), sentinel on disjoint") {
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(300)((
      Array.fill(rnd.nextInt(40) + 1)(rnd.nextInt(50).toLong)
        .distinct.sorted.toSeq,
      Array.fill(rnd.nextInt(40) + 1)(rnd.nextInt(50).toLong)
        .distinct.sorted.toSeq))
    val df = rows.toDF("a", "b")
    val got = df.select(
      call_function("min_common_sorted", col("a"), col("b")).as("fast"),
      coalesce(array_min(array_intersect(col("a"), col("b"))),
        lit(Long.MinValue)).as("slow"))
      .collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // interpreted path too (driver-side filter eval)
    val one = Seq((Seq(1L, 5L, 9L), Seq(3L, 5L, 9L))).toDF("a", "b")
    assert(one.filter(
      call_function("min_common_sorted", col("a"), col("b")) === 5L)
      .count() === 1L)
  }

  test("native expressions survive interpreted (non-codegen) eval") {
    val df = Seq((Seq(1L, 2L, 3L), Seq(2L, 3L, 4L))).toDF("a", "b")
    // force interpreted path by evaluating through a filter on the driver
    val n = df.filter(
      call_function("intersect_card_sorted", col("a"), col("b")) === 2L)
      .count()
    assert(n === 1L)
  }

  test("native repetition_stats matches composed explode/HOF formulation") {
    val rnd = new scala.util.Random(17)
    val words = Seq("a", "bb", "ccc", "dd", "e")
    val rows = (1L to 200L).map { id =>
      (id, Seq.fill(rnd.nextInt(30))(words(rnd.nextInt(words.length)))
        .mkString(" "))
    } :+ (900L, "") :+ (901L, "solo") :+ (902L, "x x x x")
    val df = rows.toDF("id", "text")
    val toks = filter(split(lower(col("text")), "[ \\t\\n\\u000B\\f\\r]+"),
      t => t =!= "")
    val bigrams = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - lit(1)),
        i => concat_ws(" ", slice(toks, i, lit(2)))))
      .otherwise(array().cast("array<string>"))
    // composed: longest equal-run in the sorted token array == top count
    val topRun = aggregate(
      array_sort(toks),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc("prev"), acc("run") + lit(1L))
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))
    val stats = graft.expr.nat(graft.expr.SignatureExpressions
      .RepetitionStats(graft.expr.toExpr(toks)))
    val got = df.select(
      stats.as("fast"),
      array(
        size(toks).cast("long"),
        size(array_distinct(toks)).cast("long"),
        topRun,
        size(bigrams).cast("long"),
        (size(bigrams) - size(array_distinct(bigrams))).cast("long"))
        .as("slow"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
  }

  test("native minhash matches composed xxhash64 chain bit-for-bit") {
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(100)(
      Array.fill(rnd.nextInt(60) + 1)(rnd.nextLong()).distinct.sorted.toSeq)
    val df = rows.toDF("hs")
    val got = df.select(
      graft.ops.Dedup.minhashFromShingles(col("hs"), 32).as("fast"),
      graft.ops.Dedup.minhashFromShinglesComposed(col("hs"), 32).as("slow"))
      .collect()
    got.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("native simhash matches composed aggregate formulation bit-for-bit") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b c d e f g", "single", "", "  spaced   out  tokens ")
    val df = texts.toDF("text")
    val got = df.select(
      graft.ops.Dedup.simhash(col("text")).as("fast"),
      graft.ops.Dedup.simhashComposed(col("text")).as("slow"))
      .collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("native md5 simhash matches composed md5-word formulation bit-for-bit") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b c d e f g", "single", "", "  spaced   out  tokens ")
    val df = texts.toDF("text")
    val got = df.select(
      graft.ops.Dedup.simhashMd5(col("text")).as("fast"),
      graft.ops.Dedup.simhashMd5Composed(col("text")).as("slow"))
      .collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("native shingle set has composed cardinality and sorted order") {
    val texts = Seq(
      "one two three four five six", "one two", "x",
      "repeat repeat repeat repeat")
    val df = texts.toDF("text")
    val got = df.select(
      graft.functions.TextFunctions.hashedShingles(col("text"), 3).as("fast"),
      graft.functions.TextFunctions.hashedShinglesComposed(col("text"), 3).as("slow"))
      .collect()
    got.foreach { r =>
      val f = r.getSeq[Long](0)
      assert(f.size === r.getSeq[Long](1).size) // same k-gram set size
      assert(f === f.sorted)
    }
  }

  test("expressions are SQL-visible via session extensions") {
    val one = spark.sql(
      "SELECT intersect_card_sorted(array(1L,2L), array(2L,9L)) AS c")
      .head().getLong(0)
    assert(one === 1L)
  }

  test("the full kernel family is SQL-visible, matching the Column forms") {
    import graft.expr.SignatureExpressions._
    val toks = array(lit("a"), lit("b"), lit("c"))
    val viaSql = spark.sql(
      """SELECT kgram_hashes(array('a','b','c'), 2) AS kg,
                simhash64(array('a','b','c')) AS sh,
                simhash_md5(array('a','b','c')) AS shm,
                repetition_stats(array('a','b','c')) AS rs,
                minhash_sig(hashed_shingle_set(array('a','b','c'), 2), 4) AS mh,
                band_keys(minhash_sig(hashed_shingle_set(array('a','b','c'), 2), 4), 2, 2) AS bk
      """).head()
    val viaCol = spark.range(1).select(
      graft.expr.nat(KGramHashes(graft.expr.toExpr(toks), 2)).as("kg"),
      graft.expr.nat(SimHash64(graft.expr.toExpr(toks))).as("sh"),
      graft.expr.nat(SimHashMd5(graft.expr.toExpr(toks))).as("shm"),
      graft.expr.nat(RepetitionStats(graft.expr.toExpr(toks))).as("rs"),
      graft.expr.nat(MinHashSig(graft.expr.toExpr(graft.expr.nat(
        HashedShingleSet(graft.expr.toExpr(toks), 2))), 4)).as("mh"),
      graft.expr.nat(BandKeys(graft.expr.toExpr(graft.expr.nat(
        MinHashSig(graft.expr.toExpr(graft.expr.nat(
          HashedShingleSet(graft.expr.toExpr(toks), 2))), 4))), 2, 2)).as("bk")
    ).head()
    assert(viaSql.toSeq === viaCol.toSeq)
    // non-literal shape parameter fails loudly, not silently
    val err = intercept[Exception] {
      spark.sql("SELECT kgram_hashes(array('a'), id + 1) FROM range(1)").collect()
    }
    assert(err.getMessage.contains("integer literal"))
  }

  test("kmv_sketch aggregate == composed distinct-sort-take, any partitioning") {
    def sketch(k: Int) = graft.expr.nat(graft.expr.KmvSketch(
      graft.expr.toExpr(col("h")), k).toAggregateExpression())
    // values with duplicates, nulls, and negatives across groups
    val rows = (0 until 500).map { i =>
      (s"g${i % 3}", if (i % 41 == 0) None else Some((i * 2654435761L) % 997 - 300))
    }
    for (parts <- Seq(1, 7)) {
      val df = rows.toDF("g", "h").repartition(parts)
      val got = df.groupBy(col("g")).agg(sketch(8).as("kmv"))
        .as[(String, Seq[Long])].collect().toMap
      val want = rows.groupBy(_._1).map { case (g, rs) =>
        g -> rs.flatMap(_._2).distinct.sorted.take(8)
      }
      assert(got === want, s"parts=$parts")
      // ascending, distinct, capped
      got.values.foreach { s =>
        assert(s.length <= 8 && s == s.distinct.sorted)
      }
    }
  }
}
