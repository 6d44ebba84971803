package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over the space-separated tokens of an ALREADY-normalized
  * text column: per-bit majority vote of token xxhash64s folded into one
  * long (Charikar's scheme, as used for near-dup detection in web-scale
  * corpora).
  *
  * Exists because the `functions._` formulation (transform + aggregate with
  * a 64-wide zip_with accumulator) evaluates every lambda application
  * interpreted — O(tokens x 64) interpreted calls per row. This expression
  * does one pass over the UTF-8 bytes with a 64-int accumulator.
  *
  * Bit-identical to the Column formulation: tokens are the split of the
  * input on single spaces KEEPING empty fields (Spark `split(t, " ")`
  * semantics, limit -1), each hashed with Spark's xxhash64 (XXH64, seed
  * 42) over its UTF-8 bytes — a space is a single byte in UTF-8 and can
  * never occur inside a multi-byte sequence, so byte-splitting equals
  * string-splitting. */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(t: Any): Any =
    SimHash64Expr.simhash(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64Expr.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

object SimHash64Expr {

  /** `t` must already be whitespace-normalized (see TextAnalysis.normText). */
  def simhash64Norm(t: Column): Column =
    GraftBridge.column(SimHash64Expr(GraftBridge.expression(t)))

  private final val Seed = 42L // Spark's xxhash64 default seed

  def simhash(t: UTF8String): Long = {
    val base = t.getBaseObject
    val offset = t.getBaseOffset
    val n = t.numBytes()
    val counts = new Array[Int](64)
    var start = 0
    var i = 0
    // split on 0x20 keeping empty fields, mirroring split(t, " "): each
    // field [start, i) hashes even when empty (hash of zero bytes)
    while (i <= n) {
      val atSep = i == n || org.apache.spark.unsafe.Platform.getByte(base, offset + i) == 0x20
      if (atSep) {
        val h = XXH64.hashUnsafeBytes(base, offset + start, i - start, Seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
        start = i + 1
      }
      i += 1
    }
    var res = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) res |= 1L << b
      b += 1
    }
    res
  }
}
