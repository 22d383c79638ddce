package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: content-defined-chunking cut positions
  * ("graft_cdc_cuts", 9th native). For every 1-based CODE-POINT position
  * i ∈ [W, n], the polynomial hash of the W-code-point window ending at
  * i,
  *   h(i) = Σ_{j=0}^{W-1} cp(i-j) · B^j  mod P,
  * marks a CUT when h(i) mod D == 0 — so chunk boundaries depend only
  * on LOCAL content. That is the property fixed-stride chunking (p06)
  * lacks: inserting one character shifts every downstream fixed window,
  * but CDC boundaries resynchronize within ~W code points, which is why
  * near-identical documents share almost all their chunks (the FastCDC/
  * rsync family of storage dedup).
  *
  * Positions count Unicode CODE POINTS, the same unit Spark's
  * substring/length and DuckDB's ord()/string indexing use — so the
  * returned cuts slice identically on any text in both engines, not
  * just ASCII (an earlier byte-based form silently diverged from the
  * char-based consumers on multibyte input).
  *
  * Single O(n) primitive loop (rolling update: drop the outgoing code
  * point's B^{W-1} term, shift by B, add the incoming one —
  * algebraically equal to the window sum mod P, and pinned equal to the
  * independent per-window sum in CdcCutsExprSpec). The DuckDB oracle
  * replays the per-window SUM form with the same (B, P, D, W).
  */
case class CdcCutsExpr(child: Expression) extends UnaryExpression {

  override lazy val resolved: Boolean =
    childrenResolved && child.dataType == StringType
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_cdc_cuts"

  override def nullSafeEval(input: Any): Any =
    CdcCutsExpr.cuts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.CdcCutsExpr.cuts($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcCutsExpr {
  val W: Int = 8 // window bytes
  val B: Long = 257L // polynomial base
  val P: Long = 1000003L // modulus (values stay far from Long overflow)
  val D: Long = 64L // cut divisor -> expected chunk length ~64 bytes

  /** B^j mod P for j = 0..W-1 (index j) — shared with the oracle SQL. */
  val Pows: Array[Long] = {
    val a = new Array[Long](W)
    a(0) = 1L
    var j = 1
    while (j < W) { a(j) = a(j - 1) * B % P; j += 1 }
    a
  }

  /** 1-based cut positions over the string's Unicode code points. */
  def cuts(s: UTF8String): ArrayData = {
    val str = s.toString
    // code points up front: O(n), and gives the same indexing unit
    // Spark substring / DuckDB string slicing use
    val cps = str.codePoints().toArray
    val n = cps.length
    val out = new java.util.ArrayList[Any]()
    if (n >= W) {
      val bw1 = Pows(W - 1)
      // seed via Horner in string order: oldest code point lands on
      // B^{W-1}, the newest (window end) on B^0 — exactly h(W) of the
      // sum form
      var h = 0L
      var i = 0
      while (i < W) {
        h = (h * B + cps(i)) % P
        i += 1
      }
      if (h % D == 0L) out.add(W)
      var pos = W // 1-based position of current window end
      while (pos < n) {
        val outgoing = cps(pos - W).toLong
        val incoming = cps(pos).toLong
        h = ((h - outgoing * bw1 % P + P * B) % P * B + incoming) % P
        pos += 1
        if (h % D == 0L) out.add(pos)
      }
    }
    new GenericArrayData(out.toArray)
  }
}
