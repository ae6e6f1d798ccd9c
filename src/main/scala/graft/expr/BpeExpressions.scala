package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Real byte-pair-encoding (BPE) APPLY over pre-tokenized words.
  *
  * A trained tokenizer is a ranked merge table plus the apply loop:
  * start a word as single characters and repeatedly merge the
  * best-ranked adjacent pair until no table pair remains. The engine's
  * contract is the apply algorithm with a FIXED public table (a real
  * deployment swaps in its model's learned table — same kernel); the
  * reference engine has no tokenizer at all, so the table's content is
  * ours to pin, and pinning it makes the operator exactly reproducible
  * by the DuckDB oracle, which inlines [[BpeOps.Merges]] into a
  * recursive CTE replaying the identical merge steps.
  */
object BpeOps {

  /** The fixed ranked merge table (rank = position; lower merges first).
    * Lowercase ASCII units only — pre-tokens are lowercased, and
    * multi-character pre-tokens are alphanumeric by construction, so no
    * unit can ever contain the `|` used as the rank-lookup separator.
    */
  val Merges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "an" -> "d",
    "e" -> "r", "r" -> "e", "o" -> "n", "a" -> "t", "e" -> "n",
    "o" -> "r", "e" -> "s", "in" -> "g", "o" -> "u", "i" -> "t",
    "i" -> "s", "a" -> "r", "s" -> "t", "e" -> "d", "o" -> "f",
    "t" -> "o", "l" -> "l", "0" -> "0", "1" -> "2")

  private val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    Merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.put(a + "|" + b, Integer.valueOf(i))
    }
    m
  }

  /** BPE-apply over a word array: each word starts as single CODE POINTS
    * (code points, not UTF-16 chars, so supplementary characters stay
    * whole — DuckDB's string indexing is code-point-based and the oracle
    * must see the same unit split) and, while any adjacent pair is in
    * the table, the LEFTMOST occurrence of the LOWEST-ranked applicable
    * pair is merged — one merge per step, the leftmost-first
    * serialization of the classic merge loop, and exactly the step the
    * oracle's recursive CTE replays. Output: all words' subword units,
    * flattened in order.
    */
  def bpeSubwords(toks: ArrayData): ArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    val nw = toks.numElements()
    var w = 0
    while (w < nw) {
      val word = toks.getUTF8String(w).toString
      val units = new java.util.ArrayList[String]()
      var i = 0
      while (i < word.length) {
        val cc = Character.charCount(word.codePointAt(i))
        units.add(word.substring(i, i + cc))
        i += cc
      }
      var done = units.size() <= 1
      while (!done) {
        var bestRank = Int.MaxValue
        var bestIdx = -1
        var j = 0
        while (j < units.size() - 1) {
          val r = rank.get(units.get(j) + "|" + units.get(j + 1))
          if (r != null && r.intValue() < bestRank) {
            bestRank = r.intValue(); bestIdx = j
          }
          j += 1
        }
        if (bestIdx < 0) done = true
        else {
          units.set(bestIdx, units.get(bestIdx) + units.get(bestIdx + 1))
          units.remove(bestIdx + 1)
          done = units.size() <= 1
        }
      }
      var k = 0
      while (k < units.size()) {
        out.add(UTF8String.fromString(units.get(k))); k += 1
      }
      w += 1
    }
    new GenericArrayData(out.toArray(new Array[UTF8String](out.size())))
  }
}

object BpeExpressions {

  /** Codegen'd wrapper over [[BpeOps.bpeSubwords]] — same single-static-
    * call shape as the [[SignatureExpressions]] kernels, so the stage
    * keeps whole-stage codegen.
    */
  case class BpeSubwords(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "bpe_subwords"
    override protected def withNewChildInternal(newChild: Expression): BpeSubwords =
      copy(child = newChild)
    override def nullSafeEval(in: Any): Any =
      BpeOps.bpeSubwords(in.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.expr.BpeOps.bpeSubwords($c)")
  }
}
