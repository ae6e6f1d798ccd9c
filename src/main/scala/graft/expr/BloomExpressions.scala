package graft.expr

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership as a native predicate, the executor side of
  * [[graft.ops.BloomPrune]]'s semi-join reduction.
  *
  * The filter travels as its serialized bytes (the expression tree is
  * shipped to executors; `BloomFilter` deserializes once per task via the
  * transient lazy) and inside whole-stage codegen the probe compiles to a
  * single virtual call on the shared filter object — no UDF boxing, no
  * per-row allocation, so the prune keeps the scan's codegen span intact.
  * This is the same shape Catalyst's own runtime-filter rewrite injects
  * when AQE statistics trigger it; graft's operator is the deterministic,
  * statistics-independent version (see BloomPrune for why).
  */
object BloomExpressions {

  /** True iff the long child MIGHT be in the serialized bloom filter
    * (one-sided error: false positives only — membership of every
    * inserted key is certain, so filtering with it never drops a true
    * match).
    */
  case class BloomMightContainLong(child: Expression, filterBytes: Array[Byte])
      extends UnaryExpression {
    override def dataType: DataType = BooleanType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "bloom_might_contain"
    override protected def withNewChildInternal(
        newChild: Expression): BloomMightContainLong = copy(child = newChild)

    @transient private lazy val bloom: BloomFilter =
      BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

    override def nullSafeEval(v: Any): Any =
      bloom.mightContainLong(v.asInstanceOf[Long])

    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bf = ctx.addReferenceObj("bloom", bloom,
        classOf[BloomFilter].getName)
      defineCodeGen(ctx, ev, c => s"$bf.mightContainLong($c)")
    }
  }
}
