package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Asymmetric-distance dot product for PQ ANN (the ADC of Jégou et al.
  * 2011): <query, reconstruction(codes)> computed WITHOUT materializing
  * the reconstruction — per candidate it sums the exact query-vs-centroid
  * dot of each subspace's selected codebook entry. The query side stays
  * full-precision (asymmetric: only the index is quantized), so the only
  * approximation error is the index vector's quantization error.
  *
  * One compiled pass, O(d) per candidate — the same cost as a plain
  * VecDot but against an index ~10-30x smaller, which is the win that
  * matters when the candidate stream is 100 TB. Missing dims (query
  * shorter than m*sub, codes array shorter than m) contribute 0; an
  * out-of-range code contributes 0 rather than throwing (corrupt index
  * rows degrade, never kill, a scan).
  */
case class PqAdcDot(left: Expression, right: Expression,
                    codebooks: Array[Array[Array[Double]]])
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_dot"

  override def nullSafeEval(q: Any, codes: Any): Any =
    PqAdcDot.adcDot(q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData],
      codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    defineCodeGen(ctx, ev,
      (q, c) => s"graft.functions.PqAdcDot.adcDot($q, $c, $cbRef)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcDot =
    copy(left = newLeft, right = newRight)

  override def equals(o: Any): Boolean = o match {
    case other: PqAdcDot =>
      left == other.left && right == other.right && java.util.Arrays.deepEquals(
        codebooks.asInstanceOf[Array[AnyRef]],
        other.codebooks.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * left.hashCode() + right.hashCode()) +
      java.util.Arrays.deepHashCode(codebooks.asInstanceOf[Array[AnyRef]])
}

object PqAdcDot {

  /** Column API: `query` is `array<double>`, `codes` is the `array<int>`
    * from [[PqEncode]], `codebooks` the same m x ksub x sub table. */
  def pqAdcDot(query: Column, codes: Column,
               codebooks: Seq[Seq[Seq[Double]]]): Column =
    GraftBridge.column(PqAdcDot(GraftBridge.expression(query),
      GraftBridge.expression(codes),
      codebooks.map(_.map(_.toArray).toArray).toArray))

  /** Static entry point shared by interpreted eval and generated code. */
  def adcDot(q: ArrayData, codes: ArrayData,
             codebooks: Array[Array[Array[Double]]]): Double = {
    val xs = q.toDoubleArray()
    val m = math.min(codebooks.length, codes.numElements())
    var s = 0.0
    var j = 0
    var base = 0
    while (j < m) {
      val book = codebooks(j)
      val sub = if (book.length == 0) 0 else book(0).length
      val code = codes.getInt(j)
      if (code >= 0 && code < book.length) {
        val cent = book(code)
        val n = math.min(sub, math.max(0, xs.length - base))
        var t = 0
        while (t < n) { s += xs(base + t) * cent(t); t += 1 }
      }
      j += 1
      base += sub
    }
    s
  }
}
