package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing the DISTINCT 64-bit hashes of all
  * `spanTokens`-token windows of a pre-normalized (trimmed, single-space)
  * string in ONE compiled pass per row.
  *
  * Why not `transform(sequence(..), i -> xxhash64(concat_ws(slice(..))))`:
  * Spark's higher-order functions are CodegenFallback — every window costs
  * an interpreted lambda application that materializes a sliced array and
  * a concatenated string before hashing (measured ~8x the whole
  * `dedup_span_exact` probe at sf0.1). Because the normalized text joins
  * tokens with single spaces, each window is literally a char range of the
  * input, so this expression hashes ranges in place: one boundary scan +
  * one FNV-1a/fmix64 pass per window, zero allocation beyond the result.
  *
  * Pure function of the string content => deterministic across
  * partitionings and cluster sizes. The hash stands in for span equality
  * only (never surfaced), so it needs determinism, not xxhash64
  * compatibility; 64-bit collisions are negligible at any realistic
  * window count and would only merge two span-identity keys.
  */
case class SpanHashes(child: Expression, spanTokens: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "span_hashes"

  override def nullSafeEval(input: Any): Any =
    SpanHashes.evalUTF8(input.asInstanceOf[UTF8String], spanTokens)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SpanHashes.evalUTF8($c, $spanTokens)")

  override protected def withNewChildInternal(newChild: Expression): SpanHashes =
    copy(child = newChild)
}

object SpanHashes {

  /** Column API: distinct window hashes of a PRE-NORMALIZED string. */
  def spanHashes(c: Column, spanTokens: Int): Column =
    GraftBridge.column(SpanHashes(GraftBridge.expression(c), spanTokens))

  /** Static entry point used by both interpreted eval and generated code. */
  def evalUTF8(input: UTF8String, spanTokens: Int): ArrayData =
    new GenericArrayData(compute(input.toString, spanTokens))

  def compute(s: String, spanTokens: Int): Array[Long] = {
    val starts = tokenStarts(s)
    val nTokens = starts.length - 1
    if (nTokens < spanTokens) return Array.emptyLongArray
    val nWin = nTokens - spanTokens + 1
    val seen = new java.util.LinkedHashSet[java.lang.Long](nWin * 2)
    var w = 0
    while (w < nWin) {
      seen.add(windowHash(s, starts(w), starts(w + spanTokens) - 1))
      w += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  /** Token start offsets of a single-space-normalized string, with a
    * sentinel "start of one-past-last token" (= length + 1) appended, so
    * token k spans chars [starts(k), starts(k+1) - 1). Empty string =>
    * a single empty token. SHARED by [[SpanHashes]], [[SpanHashesPos]]
    * and [[CutTokenSpans]] — window identity across the span operators
    * depends on all three agreeing on boundaries. */
  private[functions] def tokenStarts(s: String): Array[Int] = {
    val len = s.length
    var nTokens = 1
    var i = 0
    while (i < len) { if (s.charAt(i) == ' ') nTokens += 1; i += 1 }
    val starts = new Array[Int](nTokens + 1)
    var t = 1
    i = 0
    while (i < len) {
      if (s.charAt(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nTokens) = len + 1
    starts
  }

  /** FNV-1a over the char range [from, until) + fmix64 finalizer — the
    * single definition of window identity for every span operator. */
  private[functions] def windowHash(s: String, from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var j = from
    while (j < until) { h = (h ^ s.charAt(j)) * 0x100000001b3L; j += 1 }
    fmix64(h)
  }

  @inline private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }
}
