package graft

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.{BpeOps, PackOps}

/** Seeded randomized properties for the pure JVM kernels — invariants
  * that must hold on EVERY input, checked over a few hundred generated
  * cases (fixed seeds: deterministic, no flakiness). These complement
  * the example-based specs: examples pin chosen traces, properties pin
  * the contracts.
  */
class KernelPropertiesSpec extends AnyFunSuite {

  private def longs(a: Array[Long]): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(a)

  test("nextFitBins: greedy packing invariants on random inputs") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 300) {
      val n = rnd.nextInt(40)
      val cap = 1L + rnd.nextInt(50)
      val toks = Array.fill(n)(rnd.nextInt(80).toLong)
      val bins = {
        val out = PackOps.nextFitBins(longs(toks), cap)
        (0 until out.numElements()).map(out.getLong).toArray
      }
      assert(bins.length === n)
      if (n > 0) {
        // bins start at 0 and advance by at most 1 per doc
        assert(bins(0) === 0L)
        bins.sliding(2).foreach { w =>
          if (w.length == 2) assert(w(1) - w(0) === 0L || w(1) - w(0) === 1L)
        }
        // a bin's content exceeds capacity only when it is one oversize doc
        val byBin = toks.zip(bins).groupBy(_._2).view.mapValues(_.map(_._1))
        byBin.foreach { case (b, ts) =>
          assert(ts.sum <= cap || ts.length == 1,
            s"bin $b overfull: ${ts.toSeq} cap=$cap")
        }
        // greedy tightness: the first doc of bin k+1 would overflow bin k
        var i = 1
        while (i < n) {
          if (bins(i) != bins(i - 1)) {
            val prevSum = toks.zip(bins).filter(_._2 == bins(i - 1)).map(_._1).sum
            assert(prevSum + toks(i) > cap,
              s"doc $i opened a new bin but would have fit (sum=$prevSum + ${toks(i)} <= $cap)")
          }
          i += 1
        }
      }
    }
  }

  test("bpeSubwords: output is a merge-table fixpoint that rebuilds the word") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"
    val rankable = BpeOps.Merges.map { case (a, b) => a + "|" + b }.toSet
    for (_ <- 1 to 300) {
      val nWords = 1 + rnd.nextInt(5)
      val words = Array.fill(nWords)(
        (1 to (1 + rnd.nextInt(10)))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
      val in = new GenericArrayData(
        words.map(w => UTF8String.fromString(w)).toArray[Any])
      val out = BpeOps.bpeSubwords(in)
      val units = (0 until out.numElements())
        .map(i => out.getUTF8String(i).toString)
      // concatenation preserves the input exactly (no characters lost,
      // created, or reordered)
      assert(units.mkString === words.mkString)
      // FIXPOINT: re-segment each word's units and confirm no adjacent
      // pair within a word is still mergeable
      var idx = 0
      words.foreach { w =>
        val wordUnits = scala.collection.mutable.ArrayBuffer[String]()
        var covered = 0
        while (covered < w.length) {
          val u = units(idx); idx += 1
          wordUnits += u
          covered += u.length
        }
        assert(wordUnits.mkString === w)
        wordUnits.toSeq.sliding(2).foreach { p =>
          if (p.length == 2)
            assert(!rankable(p.head + "|" + p(1)),
              s"pair (${p.head}, ${p(1)}) in output of '$w' is still mergeable")
        }
      }
      assert(idx === units.length)
    }
  }

  test("saltedBlockPairs: exact pair coverage on random skewed block profiles") {
    val spark = SparkSessionSpec.shared
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (round <- 1 to 4) {
      // random skew profile: a few blocks with wildly different sizes
      val sizes = (1 to (1 + rnd.nextInt(4))).map(_ => 1 + rnd.nextInt(120))
      val maxRows = 1 + rnd.nextInt(40)
      val rows = sizes.zipWithIndex.flatMap { case (sz, b) =>
        (0 until sz).map(i => (b, (b * 10000 + i).toLong))
      }
      val df = rows.toDF("cell", "id")
        .select(col("cell"), col("id"), array(lit(1.0f)).as("vec"))
      val got = graft.ops.Similarity.saltedBlockPairs(df, "cell", maxRows)
        .select(least(col("a_id"), col("b_id")), greatest(col("a_id"), col("b_id")))
        .as[(Long, Long)].collect().toSet
      val expected = rows.groupBy(_._1).values.flatMap { g =>
        val ids = g.map(_._2)
        for (a <- ids; b <- ids if a < b) yield (a, b)
      }.toSet
      assert(got === expected,
        s"round $round sizes=$sizes maxRows=$maxRows: coverage mismatch")
    }
  }
}
