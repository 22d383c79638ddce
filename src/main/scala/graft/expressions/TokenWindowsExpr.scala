package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: all K-token sliding windows of a token
  * array as space-joined strings, in ONE pass — window i is
  * `concat_ws(" ", t[i], ..., t[i+K-1])` for i in 0..n−K.
  *
  * The built-in composition (K−1 chained `zip_with(acc, slice(t, j, len),
  * concat_ws)` layers — the grams3 shape generalized) allocates K−1
  * intermediate string arrays per ROW and runs an interpreted lambda per
  * element per layer; at K=12 it was the dominant cost of
  * d22_substring_dedup (measured ~10 s at sf0.1, the slowest query on
  * the surface, and the span build runs TWICE — dup-key side and mark
  * side). This expression copies each window's token slice once into a
  * single `UTF8String.concatWs` call: only the output strings are
  * allocated. Sub-K docs yield an empty array, exactly like the zipped
  * slices of length `greatest(n−K+1, 0)` (equivalence with the built-in
  * chain is pinned by TokenWindowsSpec).
  */
case class TokenWindowsExpr(child: Expression, k: Int) extends UnaryExpression {

  override lazy val resolved: Boolean = childrenResolved && k >= 1 && (child.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  })
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_token_windows"

  override def nullSafeEval(input: Any): Any =
    TokenWindowsExpr.windows(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TokenWindowsExpr.windows($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenWindowsExpr {
  private val Space = UTF8String.fromString(" ")

  def windows(t: ArrayData, k: Int): ArrayData = {
    val n = t.numElements()
    val m = n - k + 1
    if (m <= 0) return new GenericArrayData(new Array[Any](0))
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = t.getUTF8String(i); i += 1 }
    val out = new Array[Any](m)
    val win = new Array[UTF8String](k)
    i = 0
    while (i < m) {
      System.arraycopy(toks, i, win, 0, k)
      out(i) = UTF8String.concatWs(Space, win: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}
