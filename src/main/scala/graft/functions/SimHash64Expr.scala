package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over the space-separated tokens of an ALREADY-normalized
  * text column: per-bit majority vote of token hashes folded into one
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
  * semantics, limit -1), each hashed over its UTF-8 bytes — a space is a
  * single byte in UTF-8 and can never occur inside a multi-byte sequence,
  * so byte-splitting equals string-splitting.
  *
  * Two token-hash modes:
  *  - default: Spark's xxhash64 (XXH64, seed 42) — fastest, for
  *    production-scale runs;
  *  - `portable = true`: the first 8 bytes of the token's MD5 digest,
  *    big-endian. MD5 is engine-portable (DuckDB's `md5()` produces the
  *    identical digest), so a portable-mode signature can be recomputed
  *    from scratch by the correctness oracle — this is what turns the
  *    simhash gates from rows-only probes into hard cross-engine gates. */
case class SimHash64Expr(child: Expression, portable: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(t: Any): Any =
    if (portable) SimHash64Expr.simhashMd5(t.asInstanceOf[UTF8String])
    else SimHash64Expr.simhash(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (portable) "simhashMd5" else "simhash"
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64Expr.$fn($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

object SimHash64Expr {

  /** `t` must already be whitespace-normalized (see TextAnalysis.normText). */
  def simhash64Norm(t: Column, portable: Boolean = false): Column =
    GraftBridge.column(SimHash64Expr(GraftBridge.expression(t), portable))

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
    fold(counts)
  }

  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Portable-mode simhash: token hash = first 8 bytes of the MD5 digest,
    * big-endian (the value DuckDB's `CAST('0x' || substr(md5(w), 1, 16) AS
    * UBIGINT)` yields — signedness is irrelevant, only bits are read). */
  def simhashMd5(t: UTF8String): Long = {
    val bytes = t.getBytes // one copy; token slices index into it
    val n = bytes.length
    val md = md5Local.get()
    val counts = new Array[Int](64)
    var start = 0
    var i = 0
    while (i <= n) {
      val atSep = i == n || bytes(i) == 0x20
      if (atSep) {
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        var h = 0L
        var j = 0
        while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
        start = i + 1
      }
      i += 1
    }
    fold(counts)
  }

  private def fold(counts: Array[Int]): Long = {
    var res = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) res |= 1L << b
      b += 1
    }
    res
  }
}
