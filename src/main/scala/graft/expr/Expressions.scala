package graft.expr

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native Catalyst expressions for the two hottest inner loops in the
  * similarity/dedup operators. Both ship `doGenCode`, so inside
  * whole-stage codegen they compile to tight primitive Java loops — no
  * per-row allocation, no boxing, no intermediate arrays — where the
  * `functions.aggregate`/`zip_with`/`array_intersect` compositions they
  * replace materialize an array or hash set per row. At 10M+ candidate
  * pairs per partition that is the difference between an I/O-bound and a
  * CPU-bound verification stage.
  *
  * The reference engine's analog is "whatever JS runs inside a map
  * closure" (SURVEY §2.6); these are the Spark-idiomatic replacements,
  * per SURVEY §7.3's "custom Expression for similarity" verdict.
  */
object GraftExpressions {

  /** Fused single-pass cosine similarity over two `array<float>` columns.
    *
    * Computes dot(a,b), ‖a‖², ‖b‖² in one loop with double accumulators
    * in strict left-to-right order — bit-identical to the composed
    * `dot/(sqrt(dot)·sqrt(dot))` Column version it replaces (each
    * accumulator chain preserves its IEEE operation order), so DuckDB
    * oracle parity is unaffected.
    */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "cosine_sim"
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): CosineSim =
      copy(left = newLeft, right = newRight)

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val u = x.getFloat(i).toDouble
        val v = y.getFloat(i).toDouble
        dot += u * v; na += u * u; nb += v * v
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val u = ctx.freshName("u")
        val v = ctx.freshName("v")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $u = (double) $a.getFloat($i);
           |  double $v = (double) $b.getFloat($i);
           |  $dot += $u * $v; $na += $u * $u; $nb += $v * $v;
           |}
           |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         """.stripMargin
      })
  }

  /** |A ∩ B| for two SORTED-ascending distinct `array<bigint>` columns,
    * by merge walk — O(|A|+|B|), zero allocation. `array_intersect`
    * builds a hash set per row; on a candidate-verification stream the
    * set build dominates. Caller contract: both arrays sorted + distinct
    * (see `TextFunctions.hashedShingles`).
    */
  case class IntersectCardSorted(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "intersect_card_sorted"
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): IntersectCardSorted =
      copy(left = newLeft, right = newRight)

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n1 = x.numElements(); val n2 = y.numElements()
      var i = 0; var j = 0; var c = 0L
      while (i < n1 && j < n2) {
        val u = x.getLong(i); val v = y.getLong(j)
        if (u < v) i += 1
        else if (u > v) j += 1
        else { c += 1; i += 1; j += 1 }
      }
      c
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val c = ctx.freshName("c")
        val n1 = ctx.freshName("n1")
        val n2 = ctx.freshName("n2")
        val u = ctx.freshName("u")
        val v = ctx.freshName("v")
        s"""
           |int $n1 = $a.numElements(); int $n2 = $b.numElements();
           |int $i = 0; int $j = 0; long $c = 0L;
           |while ($i < $n1 && $j < $n2) {
           |  long $u = $a.getLong($i); long $v = $b.getLong($j);
           |  if ($u < $v) { $i++; } else if ($u > $v) { $j++; }
           |  else { $c++; $i++; $j++; }
           |}
           |${ev.value} = $c;
         """.stripMargin
      })
  }

  /** min(A ∩ B) for two SORTED-ascending distinct `array<bigint>`
    * columns, by merge walk that STOPS at the first match — the
    * PPJoin-style emit-once key: a candidate pair produced once per
    * shared prefix token keeps only the meeting whose token hash equals
    * this minimum, so the pair-dedup exchange receives each pair once.
    * Long.MinValue sentinel when disjoint (callers join on a shared
    * element, so it never fires in practice; a hash collision can at
    * worst double-emit a pair, which the downstream dropDuplicates
    * absorbs — correctness never depends on this filter).
    */
  case class MinCommonSorted(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "min_common_sorted"
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): MinCommonSorted =
      copy(left = newLeft, right = newRight)

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n1 = x.numElements(); val n2 = y.numElements()
      var i = 0; var j = 0
      while (i < n1 && j < n2) {
        val u = x.getLong(i); val v = y.getLong(j)
        if (u < v) i += 1
        else if (u > v) j += 1
        else return u
      }
      Long.MinValue
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val r = ctx.freshName("r")
        val n1 = ctx.freshName("n1")
        val n2 = ctx.freshName("n2")
        val u = ctx.freshName("u")
        val v = ctx.freshName("v")
        s"""
           |int $n1 = $a.numElements(); int $n2 = $b.numElements();
           |int $i = 0; int $j = 0; long $r = java.lang.Long.MIN_VALUE;
           |while ($i < $n1 && $j < $n2) {
           |  long $u = $a.getLong($i); long $v = $b.getLong($j);
           |  if ($u < $v) { $i++; } else if ($u > $v) { $j++; }
           |  else { $r = $u; break; }
           |}
           |${ev.value} = $r;
         """.stripMargin
      })
  }

  /** Extract a required foldable int argument (the kernel shape
    * parameters — k, band counts — are plan constants by design).
    */
  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: argument $pos must be an integer literal, got $other")
  }

  /** (name, info, builder) descriptors for [[SparkSessionExtensions]] —
    * the full native-kernel surface, so `spark.sql` users reach every
    * expression the Column API uses.
    */
  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = {
    import SignatureExpressions._
    def d(name: String, cls: Class[_], b: Seq[Expression] => Expression) =
      (FunctionIdentifier(name), new ExpressionInfo(cls.getCanonicalName, name), b)
    Seq(
      d("cosine_sim", classOf[CosineSim],
        es => CosineSim(es(0), es(1))),
      d("intersect_card_sorted", classOf[IntersectCardSorted],
        es => IntersectCardSorted(es(0), es(1))),
      d("min_common_sorted", classOf[MinCommonSorted],
        es => MinCommonSorted(es(0), es(1))),
      d("hashed_shingle_set", classOf[HashedShingleSet],
        es => HashedShingleSet(es(0), intArg(es(1), "hashed_shingle_set", 2))),
      d("minhash_sig", classOf[MinHashSig],
        es => MinHashSig(es(0), intArg(es(1), "minhash_sig", 2))),
      d("band_keys", classOf[BandKeys],
        es => BandKeys(es(0), intArg(es(1), "band_keys", 2),
          intArg(es(2), "band_keys", 3))),
      d("kgram_hashes", classOf[KGramHashes],
        es => KGramHashes(es(0), intArg(es(1), "kgram_hashes", 2))),
      d("simhash64", classOf[SimHash64], es => SimHash64(es(0))),
      d("simhash_md5", classOf[SimHashMd5], es => SimHashMd5(es(0))),
      d("repetition_stats", classOf[RepetitionStats],
        es => RepetitionStats(es(0))))
  }
}

/** Session extension installing graft's native functions — usable either
  * programmatically (`builder.withExtensions(new GraftExtensions)`) or via
  * `spark.sql.extensions=graft.expr.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExpressions.descriptors.foreach(ext.injectFunction)
}
