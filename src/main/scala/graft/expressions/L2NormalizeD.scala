package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: L2-normalize a double array in ONE fused
  * pass — sum of squares (the same left-to-right fold as graft_dot of the
  * array with itself), sqrt, divide each element.
  *
  * Replaces `transform(v, x => x / sqrt(graft_dot(v, v)))`: a Spark
  * higher-order-function lambda re-evaluates captured outer expressions
  * PER ELEMENT, so the HOF form recomputes the full dot product for every
  * one of the array's n elements — an O(n²) interpreted loop per row that
  * dominated the k-means fit and the exact-pair prelude (measured: the
  * quantizer's per-corpus-pass cost dropped ~4× when this landed). The
  * arithmetic is bitwise identical to the HOF form and to the DuckDB
  * oracle mirror (divide each element by sqrt of the sequential dot).
  */
case class L2NormalizeD(child: Expression) extends UnaryExpression {

  private def isDoubleArray(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  override lazy val resolved: Boolean =
    childrenResolved && isDoubleArray(child.dataType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_l2norm"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) { val e = x.getDouble(i); ss += e * e; i += 1 }
    val norm = math.sqrt(ss)
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = x.getDouble(i) / norm; i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val ss = ctx.freshName("ss")
      val norm = ctx.freshName("norm")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val e = ctx.freshName("e")
      s"""
         |int $n = $a.numElements();
         |double $ss = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $e = $a.getDouble($i);
         |  $ss += $e * $e;
         |}
         |double $norm = java.lang.Math.sqrt($ss);
         |double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $a.getDouble($i) / $norm;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
