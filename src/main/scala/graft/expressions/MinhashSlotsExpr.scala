package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import graft.functions.TextFns

/** Native Catalyst expression: all K minhash slots of a document's
  * shingle-hash array in ONE fused pass —
  * `slot[k] = min over h of (A(k)*h + B(k)) mod P`.
  *
  * The built-in composition ([[graft.functions.TextFns.minhashSlotsBuiltin]],
  * `transform(sequence(0, K-1), k => array_min(transform(hms, ...)))`)
  * traverses the hash array K times and allocates K transformed arrays
  * per ROW — measured as the dominant cost of the per-row signature path
  * (d08 / streaming near-dup dedup). This expression runs the K×N loop
  * over primitive longs with one output allocation. Empty input yields
  * K null slots, exactly like `array_min` over an empty array — callers
  * fall back to exact-content keys for sub-shingle docs (equivalence
  * with the built-in composition and an independent Scala fold is pinned
  * by MinhashSlotsSpec).
  */
case class MinhashSlotsExpr(child: Expression) extends UnaryExpression {

  override lazy val resolved: Boolean = childrenResolved && (child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  })
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash_slots"

  override def nullSafeEval(input: Any): Any =
    MinhashSlotsExpr.slots(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.MinhashSlotsExpr.slots($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSlotsExpr {
  private val A = TextFns.MinhashA
  private val B = TextFns.MinhashB
  private val P = TextFns.MinhashP
  private val K = TextFns.MinhashK

  /** One fused K×N pass; empty input → K nulls (array_min semantics). */
  def slots(hms: ArrayData): ArrayData = {
    val n = hms.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](K))
    val out = new Array[Long](K)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hms.getLong(i)
      var k = 0
      while (k < K) {
        val v = (A(k) * h + B(k)) % P
        if (v < out(k)) out(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
