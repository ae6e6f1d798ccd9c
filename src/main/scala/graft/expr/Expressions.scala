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

  /** (name, info, builder) descriptors for [[SparkSessionExtensions]]. */
  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getCanonicalName, "cosine_sim"),
      (es: Seq[Expression]) => CosineSim(es(0), es(1))),
    (FunctionIdentifier("intersect_card_sorted"),
      new ExpressionInfo(classOf[IntersectCardSorted].getCanonicalName,
        "intersect_card_sorted"),
      (es: Seq[Expression]) => IntersectCardSorted(es(0), es(1))))
}

/** Session extension installing graft's native functions — usable either
  * programmatically (`builder.withExtensions(new GraftExtensions)`) or via
  * `spark.sql.extensions=graft.expr.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExpressions.descriptors.foreach(ext.injectFunction)
}
