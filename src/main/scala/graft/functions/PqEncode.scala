package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization encoder (Jégou, Douze, Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011): the vector is
  * split into `m` contiguous subspaces and each subspace is replaced by
  * the index of its nearest (L2) codebook centroid — m small integers
  * instead of d doubles, the 10-30x index shrink that makes a 100 TB
  * embedding store scannable. One compiled pass per row:
  * struct(codes array<int>, recon_norm double) where recon_norm is the
  * L2 norm of the reconstruction (needed once per INDEX row for cosine
  * ADC scoring, so it is computed at encode time, never at query time).
  *
  * L2 argmin per subspace uses |c|^2 - 2<x_j, c> (the |x_j|^2 term is
  * constant within a subspace); centroid norms are precomputed at
  * construction. Ties break to the lowest centroid index; a vector
  * shorter than m*sub treats missing dims as 0. NaN scores rank last
  * (a corrupt embedding degrades, never poisons, the argmin).
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = PqEncode.outType
  override def prettyName: String = "pq_encode"

  @transient private lazy val norms2: Array[Array[Double]] =
    PqEncode.norms2(codebooks)

  override def nullSafeEval(input: Any): Any =
    PqEncode.encode(input.asInstanceOf[ArrayData], codebooks, norms2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    val n2Ref = ctx.addReferenceObj("pqNorms2", norms2, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PqEncode.encode($c, $cbRef, $n2Ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)

  override def equals(o: Any): Boolean = o match {
    case other: PqEncode =>
      child == other.child && java.util.Arrays.deepEquals(
        codebooks.asInstanceOf[Array[AnyRef]],
        other.codebooks.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() +
      java.util.Arrays.deepHashCode(codebooks.asInstanceOf[Array[AnyRef]])
}

object PqEncode {

  val outType: StructType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("recon_norm", DoubleType, nullable = false)))

  /** Column API: `vec` is `array<double>`, `codebooks` is m x ksub x sub. */
  def pqEncode(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    GraftBridge.column(PqEncode(GraftBridge.expression(vec),
      codebooks.map(_.map(_.toArray).toArray).toArray))

  def norms2(codebooks: Array[Array[Array[Double]]]): Array[Array[Double]] =
    codebooks.map(_.map(c => {
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s
    }))

  /** Static entry point shared by interpreted eval and generated code
    * (named encode, not eval — see [[Int8Quantize.evalArr]]'s forwarder
    * note). */
  def encode(vec: ArrayData, codebooks: Array[Array[Array[Double]]],
             cNorms2: Array[Array[Double]]): InternalRow = {
    val xs = vec.toDoubleArray()
    val m = codebooks.length
    val codes = new Array[Int](m)
    var reconNorm2 = 0.0
    var j = 0
    var base = 0
    while (j < m) {
      val book = codebooks(j)
      val sub = if (book.length == 0) 0 else book(0).length
      var best = 0
      var bestScore = Double.PositiveInfinity
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var dotv = 0.0
        val n = math.min(sub, math.max(0, xs.length - base))
        var t = 0
        while (t < n) { dotv += xs(base + t) * cent(t); t += 1 }
        val score = cNorms2(j)(c) - 2.0 * dotv
        // strict < keeps the lowest index on ties; NaN never wins
        if (score < bestScore) { best = c; bestScore = score }
        c += 1
      }
      codes(j) = best
      if (book.length > 0) reconNorm2 += cNorms2(j)(best)
      j += 1
      base += sub
    }
    new GenericInternalRow(
      Array[Any](new GenericArrayData(codes), math.sqrt(reconNorm2)))
  }
}
