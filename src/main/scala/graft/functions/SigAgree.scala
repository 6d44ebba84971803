package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Fraction of positions where two array<long> MinHash signatures agree —
  * the MinHash estimate of Jaccard similarity. Native for the same reason
  * as [[VecDot]]: this runs once per candidate pair (hundreds of thousands
  * of pairs), and the zip_with/filter/size formulation is interpreted. */
case class SigAgree(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sig_agree"

  override def nullSafeEval(a: Any, b: Any): Any =
    SigAgree.agree(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SigAgree.agree($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): SigAgree =
    copy(left = newLeft, right = newRight)
}

object SigAgree {

  def sigAgree(a: Column, b: Column): Column =
    GraftBridge.column(SigAgree(GraftBridge.expression(a), GraftBridge.expression(b)))

  def agree(a: ArrayData, b: ArrayData): Double = {
    val xs = a.toLongArray()
    val ys = b.toLongArray()
    val n = math.min(xs.length, ys.length)
    if (n == 0) return 0.0
    var eq = 0
    var i = 0
    while (i < n) { if (xs(i) == ys(i)) eq += 1; i += 1 }
    eq.toDouble / n
  }
}
