package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Sequence-packing kernel: next-fit bin assignment over an ordered
  * token-count array (see [[graft.ops.Packing]] for the operator and the
  * scale rationale for packing per shard).
  */
object PackOps {

  /** Next-fit packing: walk the counts in order, accumulate into the
    * current bin, and open a new bin when the next count would overflow
    * `capacity`. Element i's bin id is returned. The first element
    * always opens bin 0; an oversized element (> capacity) sits alone in
    * its own bin (truncation is chunking's job, not packing's). The
    * p04 oracle replays exactly this recurrence per (group, row-number).
    */
  def nextFitBins(toks: ArrayData, capacity: Long): ArrayData = {
    val n = toks.numElements()
    val out = new Array[Long](n)
    var bin = 0L
    var acc = 0L
    var i = 0
    while (i < n) {
      val t = toks.getLong(i)
      if (i == 0) acc = t
      else if (acc + t > capacity) { bin += 1; acc = t }
      else acc += t
      out(i) = bin
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

object PackExpressions {

  /** Codegen'd wrapper over [[PackOps.nextFitBins]] — single static call,
    * stages keep whole-stage codegen.
    */
  case class NextFitBins(child: Expression, capacity: Long)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "next_fit_bins"
    override protected def withNewChildInternal(newChild: Expression): NextFitBins =
      copy(child = newChild)
    override def nullSafeEval(in: Any): Any =
      PackOps.nextFitBins(in.asInstanceOf[ArrayData], capacity)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.expr.PackOps.nextFitBins($c, ${capacity}L)")
  }
}
