package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the rolling polynomial document
  * fingerprint `fold(acc = 0; acc = (acc * 31 + byte) % 1e9+7)` as one
  * primitive loop over the string's UTF-8 bytes.
  *
  * The built-in form (TextFns.fingerprint) is `aggregate(split(s, ""),
  * …)` — it materializes one single-char UTF8String per CHARACTER and
  * evaluates an interpreted lambda per element; at corpus scale that is
  * an allocation per byte of input. This expression is byte-identical
  * to it on ASCII input (single-byte chars: `ascii(char) == byte`; the
  * synthetic corpus and the DuckDB oracle's list_reduce mirror share
  * that contract — the same ASCII precondition m01/m02 already pin).
  * Equivalence with the HOF fold and an independent Scala loop is
  * property-tested in FingerprintExprSpec.
  */
case class FingerprintExpr(child: Expression) extends UnaryExpression {

  override lazy val resolved: Boolean =
    childrenResolved && child.dataType == StringType
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint"

  override def nullSafeEval(input: Any): Any =
    FingerprintExpr.roll(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.FingerprintExpr.roll($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FingerprintExpr {
  val Mod: Long = 1000000007L

  def roll(bytes: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31L + (bytes(i) & 0xffL)) % Mod
      i += 1
    }
    acc
  }
}
