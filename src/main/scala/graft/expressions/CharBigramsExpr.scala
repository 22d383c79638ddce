package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: per-document char-bigram COUNTS over the
  * cleaned text — `(g, n)` structs for every distinct bigram of
  * `regexp_replace(lower(text), "[^a-z ]", "")` — in ONE byte pass.
  *
  * The built-in form (clean → `split` into a per-char string array →
  * two `slice`s → `zip_with(concat)` → `explode` → (doc_id, g)
  * `HashAggregate`) allocates one single-char UTF8String per character
  * and one 2-char string per POSITION, then shuffles the collapsed
  * counts — the t00 prelude's dominant build cost (3.9 s of its 6.2 s
  * at sf0.1). This expression lowercases once (the same
  * `UTF8String.toLowerCase` the built-in `lower` calls), filters bytes
  * to `[a-z ]` (multi-byte UTF-8 units are ≥ 0x80, so per-byte
  * filtering is exactly the regex's per-character strip), folds counts
  * into a 27×27 long table, and emits only the DISTINCT bigrams — the
  * aggregate happens inside the projection, so the (doc_id, g, n)
  * frame needs NO exchange at all: the memo build becomes map-side
  * pure. Equivalence with the built-in chain is pinned by
  * CharBigramsSpec on the real corpus plus unicode/degenerate edges.
  *
  * Output order is bigram-table order (row-major over the 27×27
  * grid) — deterministic, and irrelevant to every consumer (the rows
  * are exploded into keyed joins/aggregates).
  */
case class CharBigramsExpr(child: Expression) extends UnaryExpression {

  override lazy val resolved: Boolean = childrenResolved && (child.dataType match {
    case StringType => true
    case _ => false
  })
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("g", StringType, nullable = false),
      StructField("n", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_char_bigrams"

  override def nullSafeEval(input: Any): Any =
    CharBigramsExpr.bigrams(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.CharBigramsExpr.bigrams($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharBigramsExpr {

  /** alphabet index: 'a'..'z' -> 0..25, ' ' -> 26, everything else -1 */
  @inline private def idx(b: Byte): Int =
    if (b >= 'a' && b <= 'z') b - 'a'
    else if (b == ' ') 26
    else -1

  private def sym(i: Int): Byte = if (i == 26) ' '.toByte else ('a' + i).toByte

  def bigrams(input: UTF8String): ArrayData = {
    // the same lowercase the built-in `lower` applies (ASCII fast path,
    // JDK toLowerCase otherwise), so chars that lowercase INTO [a-z]
    // (e.g. Kelvin sign -> 'k') behave identically to the regex chain
    val bytes = input.toLowerCase.getBytes
    val counts = new Array[Long](27 * 27)
    var prev = -1
    var i = 0
    while (i < bytes.length) {
      val cur = idx(bytes(i))
      if (cur >= 0) {
        if (prev >= 0) counts(prev * 27 + cur) += 1
        prev = cur
      }
      // a stripped byte does NOT break adjacency: the regex REMOVES the
      // char, so its neighbors become adjacent in the cleaned string —
      // prev carries across, exactly like the built-in chain
      i += 1
    }
    var m = 0
    var j = 0
    while (j < counts.length) { if (counts(j) != 0) m += 1; j += 1 }
    val out = new Array[Any](m)
    var k = 0
    j = 0
    while (j < counts.length) {
      if (counts(j) != 0) {
        val gb = new Array[Byte](2)
        gb(0) = sym(j / 27)
        gb(1) = sym(j % 27)
        out(k) = new GenericInternalRow(
          Array[Any](UTF8String.fromBytes(gb), counts(j)))
        k += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }
}
