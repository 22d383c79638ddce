package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native gram-hash kernels for the STREAMING per-row hot paths (r13).
  *
  * The streaming rows d21 (signature dedup) and p23 (Bloom
  * decontamination) computed, per arriving document, a higher-order
  * chain — `transform(array_distinct(grams3(tokens(text))), g =>
  * h60(g)…)` / `filter(grams, g => graft_bloom_contains(…))`. Every
  * lambda function (`zip_with`, `transform`, `filter`) is
  * CodegenFallback, so the WHOLE per-row pipeline ran interpreted —
  * and a file-stream micro-batch over one small file is a single task,
  * so it ran interpreted on ONE core (measured r13, JobProfile: p23's
  * data batch 3.2 s for a 4,750-doc file; d21 equivalent). Batch
  * queries dodge this with `explode` + codegen'd per-gram rows, but a
  * stateless append-mode stream cannot explode-and-reaggregate without
  * adding a stateful shuffle per micro-batch.
  *
  * These two expressions compile the pipeline into one byte pass.
  * Because `tokens` splits on a SINGLE space, the 3-gram
  * `concat_ws(" ", t[i], t[i+1], t[i+2])` is exactly the original
  * byte slice from t[i]'s start to t[i+2]'s end — so gram strings are
  * zero-copy slices of the input. Distinctness via a LinkedHashSet of
  * those slices (UTF8String equals/hashCode are byte-wise),
  * first-occurrence order — the `array_distinct` contract.
  * Equivalence with the built-in chains is pinned by GramHashSpec on
  * the real corpus plus edge cases (empty text, multi-space runs,
  * <3-token docs, unicode).
  */
object GramHash {

  /** Distinct 3-gram slices of `split(text, " ")` in first-occurrence
    * order. Tokens are byte ranges between single 0x20 separators
    * (0x20 never occurs inside a multi-byte UTF-8 sequence), trailing
    * empties kept — Spark's split(_, " ") with limit -1.
    */
  def distinctGrams(input: UTF8String): java.util.LinkedHashSet[UTF8String] = {
    val bytes = input.getBytes
    // token start offsets (token i ends at starts(i+1) - 2, i.e. before
    // the separating space; the last token ends at bytes.length - 1)
    var nTok = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' '.toByte) nTok += 1; i += 1 }
    val starts = new Array[Int](nTok + 1)
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' '.toByte) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nTok) = bytes.length + 1 // virtual separator past the end
    val out = new java.util.LinkedHashSet[UTF8String]()
    var g = 0
    while (g + 2 < nTok) {
      val from = starts(g)
      val until = starts(g + 3) - 1 // end of token g+2
      out.add(UTF8String.fromBytes(bytes, from, until - from))
      g += 1
    }
    out
  }

  /** h60(g) % p over [[distinctGrams]] — the d21 signature front. */
  def gramH60Mod(input: UTF8String, p: Long): ArrayData = {
    val grams = distinctGrams(input)
    val out = new Array[Long](grams.size)
    val it = grams.iterator()
    var i = 0
    while (it.hasNext) {
      out(i) = Md5Prefix60.hash60(it.next().getBytes) % p
      i += 1
    }
    new GenericArrayData(out)
  }

  /** (n_grams, n_bloom) over [[distinctGrams]] — the p23 probe:
    * a gram hits iff all k double-hashed positions of
    * (h60(g), h60("#" + g)) are set in `bits`.
    */
  def gramBloomHits(input: UTF8String, bits: Array[Byte], m: Long, k: Int): GenericInternalRow = {
    val grams = distinctGrams(input)
    var hits = 0L
    val it = grams.iterator()
    while (it.hasNext) {
      val g = it.next().getBytes
      val tagged = new Array[Byte](g.length + 1)
      tagged(0) = '#'.toByte
      System.arraycopy(g, 0, tagged, 1, g.length)
      if (BloomBits.contains(bits, Md5Prefix60.hash60(g),
          Md5Prefix60.hash60(tagged), m, k)) hits += 1L
    }
    new GenericInternalRow(Array[Any](grams.size.toLong, hits))
  }
}

/** `graft_gram_h60s(text, p)` → array<long>: h60 % p of each distinct
  * word 3-gram of `text`, first-occurrence order — bit-identical to
  * `transform(array_distinct(grams3(tokens(text))), g => h60(g) % p)`.
  * p must be a positive integer literal (it folds to a constant here).
  */
case class GramH60ModExpr(child: Expression, p: Long) extends UnaryExpression {

  override lazy val resolved: Boolean =
    childrenResolved && child.dataType == StringType && p > 0
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_h60s"

  override def nullSafeEval(input: Any): Any =
    GramHash.gramH60Mod(input.asInstanceOf[UTF8String], p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.GramHash.gramH60Mod($c, ${p}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_gram_bloom(text, bits, m, k)` → struct(n_grams, n_bloom):
  * distinct word-3-gram count and Bloom-hit count in one compiled pass —
  * bit-identical to `size(grams)` / `size(filter(grams, g =>
  * graft_bloom_contains(bits, h60(g), h60('#' || g), m, k)))` over
  * `grams = array_distinct(grams3(tokens(text)))`. m and k must be
  * integer literals (they fold to constants here — the BloomContains
  * convention).
  */
case class GramBloomHitsExpr(textExpr: Expression, bitsExpr: Expression,
    m: Long, k: Int) extends BinaryExpression {

  override def left: Expression = textExpr
  override def right: Expression = bitsExpr

  override lazy val resolved: Boolean = childrenResolved &&
    textExpr.dataType == StringType && bitsExpr.dataType == BinaryType

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_bloom", LongType, nullable = false)))
  override def prettyName: String = "graft_gram_bloom"

  override def nullSafeEval(text: Any, bits: Any): Any =
    GramHash.gramBloomHits(text.asInstanceOf[UTF8String],
      bits.asInstanceOf[Array[Byte]], m, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (text, bits) =>
      s"${ev.value} = graft.expressions.GramHash.gramBloomHits($text, $bits, ${m}L, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(textExpr = newLeft, bitsExpr = newRight)
}
