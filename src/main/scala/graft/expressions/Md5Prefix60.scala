package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the 60-bit md5-prefix string hash
  * (`conv(substring(md5(s), 1, 15), 16, 10)` as a single long-valued
  * expression) used by every minhash / simhash signature build.
  *
  * The built-in composition materializes two intermediate UTF8Strings
  * per row — md5's 32-char hex string, then the 15-char substring —
  * and re-parses the hex right back into a long. In the dedup prelude
  * that is three string allocations per shingle at corpus scale purely
  * to move 60 bits. This expression digests the UTF-8 bytes and
  * assembles the value from the first 8 digest bytes directly (first
  * 15 hex chars == top 60 bits == big-endian first 8 bytes >>> 4),
  * bit-for-bit identical to the built-in composition and to the DuckDB
  * oracle mirror `CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)`
  * (equivalence is property-tested in Md5Prefix60Spec).
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override lazy val resolved: Boolean =
    childrenResolved && child.dataType == StringType
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5p60"

  override def nullSafeEval(input: Any): Any =
    Md5Prefix60.hash60(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.Md5Prefix60.hash60($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Prefix60 {
  // MessageDigest is not thread-safe; one instance per task thread,
  // reset-by-digest on every call — no per-row allocation
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5(bytes): big-endian long of digest bytes 0..7,
    * unsigned-shifted right by 4 — exactly the value of the first 15
    * hex characters of the digest parsed base-16.
    */
  def hash60(bytes: Array[Byte]): Long = {
    val d = md.get().digest(bytes)
    var acc = 0L
    var i = 0
    while (i < 8) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    acc >>> 4
  }
}
