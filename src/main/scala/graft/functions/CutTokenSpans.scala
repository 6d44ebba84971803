package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Cut `spanTokens`-token windows out of a pre-normalized (trimmed,
  * single-space) string: given the 0-based token START positions of the
  * windows to remove, drops every token covered by the UNION of the
  * intervals [start, start + spanTokens) and re-joins the survivors with
  * single spaces. Output struct<clean: string, removed: int> where
  * `removed` counts cut tokens. Overlapping windows merge naturally via
  * the coverage bitmap; a fully-covered document yields ("", nTokens).
  * One compiled pass per row — the surgery stays scan-side. */
case class CutTokenSpans(left: Expression, right: Expression, spanTokens: Int)
    extends BinaryExpression {

  override def dataType: DataType = CutTokenSpans.outType
  override def prettyName: String = "cut_token_spans"

  override def nullSafeEval(text: Any, starts: Any): Any =
    CutTokenSpans.evalCut(text.asInstanceOf[UTF8String],
      starts.asInstanceOf[ArrayData], spanTokens)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, s) =>
      s"graft.functions.CutTokenSpans.evalCut($t, $s, $spanTokens)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CutTokenSpans =
    copy(left = newLeft, right = newRight)
}

object CutTokenSpans {

  val outType: StructType = StructType(Seq(
    StructField("clean", StringType, nullable = false),
    StructField("removed", IntegerType, nullable = false)))

  /** Column API: text must be pre-normalized; starts are 0-based token
    * offsets of the windows to cut (any order, duplicates fine). */
  def cutTokenSpans(text: Column, starts: Column, spanTokens: Int): Column =
    GraftBridge.column(CutTokenSpans(
      GraftBridge.expression(text), GraftBridge.expression(starts), spanTokens))

  /** Static entry point used by both interpreted eval and generated code.
    * Token boundaries come from [[SpanHashes.tokenStarts]] — the same
    * definition the window hashers use, so cut positions line up. */
  def evalCut(input: UTF8String, startsArr: ArrayData, spanTokens: Int): InternalRow = {
    val s = input.toString
    val len = s.length
    val nStarts = startsArr.numElements()
    if (len == 0 || nStarts == 0)
      return new GenericInternalRow(Array[Any](input, 0))
    val starts = SpanHashes.tokenStarts(s)
    val nTokens = starts.length - 1
    // coverage bitmap over token indices
    val covered = new Array[Boolean](nTokens)
    var i = 0
    while (i < nStarts) {
      var p = startsArr.getInt(i)
      val end = math.min(p + spanTokens, nTokens)
      if (p < 0) p = 0
      while (p < end) { covered(p) = true; p += 1 }
      i += 1
    }
    val sb = new java.lang.StringBuilder(len)
    var removed = 0
    var k = 0
    while (k < nTokens) {
      if (covered(k)) removed += 1
      else {
        if (sb.length > 0) sb.append(' ')
        sb.append(s, starts(k), starts(k + 1) - 1)
      }
      k += 1
    }
    new GenericInternalRow(
      Array[Any](UTF8String.fromString(sb.toString), removed))
  }
}
