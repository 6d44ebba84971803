package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing a k-wide MinHash signature over
  * character n-gram shingles in ONE compiled pass per row.
  *
  * Why not `transform`/`aggregate` built-ins: Spark's higher-order
  * functions are CodegenFallback — each lambda application is interpreted,
  * and the nested form (`transform(seq(k), j -> array_min(transform(
  * shingles, s -> xxhash64(s, j))))`) re-evaluates the shingle array per
  * seed, costing O(k * len) interpreted evals per row (~16k for k=32 on a
  * 500-char doc). This expression does O(len * n) char work + O(distinct *
  * k) cheap mixes in tight JVM loops, and participates in whole-stage
  * codegen via a static call — measured ~100x faster at sf0.1.
  *
  * Hashing: FNV-1a over the shingle chars finalized with Murmur3's fmix64,
  * then k derived hashes via golden-ratio reseeding. Pure function =>
  * deterministic across partitionings and cluster sizes (same guarantee
  * xxhash64 gave, and the standard one-base-hash-k-mixes MinHash trick).
  */
case class MinHashSig(child: Expression, k: Int, shingleSize: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSig.evalUTF8(input.asInstanceOf[UTF8String], k, shingleSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSig.evalUTF8($c, $k, $shingleSize)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  /** Column API: k-wide MinHash signature of a (pre-normalized) string. */
  def minhashSig(c: Column, k: Int, shingleSize: Int): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(c), k, shingleSize))

  /** Static entry point used by both interpreted eval and generated code. */
  def evalUTF8(input: UTF8String, k: Int, n: Int): ArrayData =
    new GenericArrayData(compute(input.toString, k, n))

  def compute(s: String, k: Int, n: Int): Array[Long] = {
    val len = s.length
    val count = math.max(len - n + 1, 1)
    // distinct shingle base hashes (content identity via 64-bit hash;
    // collision probability negligible at any realistic shingle count)
    val seen = new java.util.HashSet[java.lang.Long](math.min(count * 2, 1 << 16))
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < count) {
      var h = 0xcbf29ce484222325L
      var j = i
      val end = math.min(i + n, len)
      while (j < end) { h = (h ^ s.charAt(j)) * 0x100000001b3L; j += 1 }
      val base = fmix64(h)
      if (seen.add(base)) {
        var q = 0
        while (q < k) {
          val v = fmix64(base + (q + 1) * 0x9E3779B97F4A7C15L)
          if (v < sig(q)) sig(q) = v
          q += 1
        }
      }
      i += 1
    }
    sig
  }

  @inline private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }
}
