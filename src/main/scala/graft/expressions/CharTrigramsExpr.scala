package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: per-document char-TRIGRAM counts over
  * the cleaned text — `(g, n)` structs for every distinct trigram of
  * `regexp_replace(lower(text), "[^a-z ]", "")` — in ONE byte pass;
  * [[CharBigramsExpr]]'s design at n = 3.
  *
  * The built-in form (clean → `split` into a per-char string array →
  * three `slice`s → two nested `zip_with(concat)`s → `explode` →
  * `HashAggregate`) allocates one single-char UTF8String per character
  * plus a 2-char AND a 3-char string per POSITION, then shuffles the
  * exploded stream — and the trained language-ID family (t23/t26/t27/
  * t29) paid that chain per ROW, re-parsing the corpus four times per
  * bench pass. This expression lowercases once (the same
  * `UTF8String.toLowerCase` the built-in `lower` calls), filters bytes
  * to `[a-z ]` (multi-byte UTF-8 units are ≥ 0x80, so per-byte
  * filtering is exactly the regex's per-character strip; a stripped
  * char JOINS its neighbors, as the regex removal does), folds counts
  * into a 27³ long table, and emits only the DISTINCT trigrams — the
  * per-doc aggregate happens inside the projection, so the memoized
  * (doc_id, lang, g, n) frame builds with NO exchange at all.
  * Equivalence with the built-in chain is pinned by CharTrigramsSpec
  * on the real corpus plus unicode/degenerate edges.
  *
  * The 27³ = 19,683-slot count table is thread-local and reused across
  * rows (zero-filled per call) — per-row allocation is only the output
  * array. Output order is trigram-table order (row-major over the 27³
  * grid) — deterministic, and irrelevant to every consumer (the rows
  * are exploded into keyed joins/aggregates).
  */
case class CharTrigramsExpr(child: Expression) extends UnaryExpression {

  override lazy val resolved: Boolean = childrenResolved && (child.dataType match {
    case StringType => true
    case _ => false
  })
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("g", StringType, nullable = false),
      StructField("n", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_char_trigrams"

  override def nullSafeEval(input: Any): Any =
    CharTrigramsExpr.trigrams(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.CharTrigramsExpr.trigrams($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharTrigramsExpr {

  /** alphabet index: 'a'..'z' -> 0..25, ' ' -> 26, everything else -1 */
  @inline private def idx(b: Byte): Int =
    if (b >= 'a' && b <= 'z') b - 'a'
    else if (b == ' ') 26
    else -1

  private def sym(i: Int): Byte = if (i == 26) ' '.toByte else ('a' + i).toByte

  private val buf = new ThreadLocal[Array[Long]] {
    override def initialValue(): Array[Long] = new Array[Long](27 * 27 * 27)
  }

  def trigrams(input: UTF8String): ArrayData = {
    // the same lowercase the built-in `lower` applies (ASCII fast path,
    // JDK toLowerCase otherwise), so chars that lowercase INTO [a-z]
    // (e.g. Kelvin sign -> 'k') behave identically to the regex chain
    val bytes = input.toLowerCase.getBytes
    val counts = buf.get()
    java.util.Arrays.fill(counts, 0L)
    var p2 = -1 // index two cleaned chars back
    var p1 = -1 // index one cleaned char back
    var i = 0
    while (i < bytes.length) {
      val cur = idx(bytes(i))
      if (cur >= 0) {
        // a stripped byte does NOT break adjacency: the regex REMOVES
        // the char, so its neighbors become adjacent in the cleaned
        // string — p2/p1 carry across, exactly like the built-in chain
        if (p2 >= 0) counts((p2 * 27 + p1) * 27 + cur) += 1
        p2 = p1
        p1 = cur
      }
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
        val gb = new Array[Byte](3)
        gb(0) = sym(j / (27 * 27))
        gb(1) = sym((j / 27) % 27)
        gb(2) = sym(j % 27)
        out(k) = new GenericInternalRow(
          Array[Any](UTF8String.fromBytes(gb), counts(j)))
        k += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }
}
