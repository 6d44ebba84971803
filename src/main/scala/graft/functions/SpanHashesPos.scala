package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Positional variant of [[SpanHashes]]: ALL `spanTokens`-token windows
  * of a pre-normalized (trimmed, single-space) string as
  * array<struct<h: long, pos: int>> — one element per window position
  * (0-based token offset), duplicates included. [[SpanHashes]] emits the
  * distinct hash SET (right for pair joins and df counts);
  * span REMOVAL additionally needs to know WHERE each window sits so the
  * covered token intervals can be cut, which is exactly the extra column
  * this emits. Same hash function (FNV-1a over the char range + fmix64),
  * so both expressions agree on window identity. */
case class SpanHashesPos(child: Expression, spanTokens: Int)
    extends UnaryExpression {

  override def dataType: DataType = SpanHashesPos.outType
  override def prettyName: String = "span_hashes_pos"

  override def nullSafeEval(input: Any): Any =
    SpanHashesPos.evalUTF8(input.asInstanceOf[UTF8String], spanTokens)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SpanHashesPos.evalUTF8($c, $spanTokens)")

  override protected def withNewChildInternal(newChild: Expression): SpanHashesPos =
    copy(child = newChild)
}

object SpanHashesPos {

  val outType: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("pos", IntegerType, nullable = false))), containsNull = false)

  /** Column API: positional window hashes of a PRE-NORMALIZED string. */
  def spanHashesPos(c: Column, spanTokens: Int): Column =
    GraftBridge.column(SpanHashesPos(GraftBridge.expression(c), spanTokens))

  /** Static entry point used by both interpreted eval and generated code.
    * Boundaries and hashing come from [[SpanHashes.tokenStarts]] /
    * [[SpanHashes.windowHash]] — one definition of window identity. */
  def evalUTF8(input: UTF8String, spanTokens: Int): ArrayData = {
    val s = input.toString
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    val starts = SpanHashes.tokenStarts(s)
    val nTokens = starts.length - 1
    if (nTokens < spanTokens) return new GenericArrayData(Array.empty[Any])
    val nWin = nTokens - spanTokens + 1
    val out = new Array[Any](nWin)
    var w = 0
    while (w < nWin) {
      out(w) = new GenericInternalRow(Array[Any](
        SpanHashes.windowHash(s, starts(w), starts(w + spanTokens) - 1), w))
      w += 1
    }
    new GenericArrayData(out)
  }
}
