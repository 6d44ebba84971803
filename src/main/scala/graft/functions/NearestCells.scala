package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** The `nProbe` nearest IVF cells for a vector (centroid indices ordered
  * by descending cosine, ties by index) in one compiled pass — the IVF
  * analogue of [[LshBits]]. Centroid norms are precomputed once at
  * construction; per row the cost is nCentroids dot products in a tight
  * loop instead of interpreted struct-array sorting. */
case class NearestCells(child: Expression, centroids: Array[Array[Double]], nProbe: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  @transient private lazy val norms: Array[Double] =
    NearestCells.norms(centroids)

  override def nullSafeEval(input: Any): Any =
    NearestCells.probe(input.asInstanceOf[ArrayData], centroids, norms, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCentroids", centroids, "double[][]")
    val nRef = ctx.addReferenceObj("ivfNorms", norms, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NearestCells.probe($c, $cRef, $nRef, $nProbe)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)

  override def equals(o: Any): Boolean = o match {
    case other: NearestCells =>
      child == other.child && nProbe == other.nProbe &&
        java.util.Arrays.deepEquals(
          centroids.asInstanceOf[Array[AnyRef]], other.centroids.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() + nProbe) +
      java.util.Arrays.deepHashCode(centroids.asInstanceOf[Array[AnyRef]])
}

object NearestCells {

  def nearestCells(c: Column, centroids: Seq[Seq[Double]], nProbe: Int): Column =
    GraftBridge.column(NearestCells(GraftBridge.expression(c),
      centroids.map(_.toArray).toArray, nProbe))

  def norms(centroids: Array[Array[Double]]): Array[Double] =
    centroids.map(p => math.sqrt(p.map(x => x * x).sum))

  def probe(vec: ArrayData, centroids: Array[Array[Double]],
            cNorms: Array[Double], nProbe: Int): ArrayData = {
    val xs = vec.toDoubleArray()
    var vn = 0.0
    var i = 0
    while (i < xs.length) { vn += xs(i) * xs(i); i += 1 }
    val vNorm = math.sqrt(vn)
    val scores = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val p = centroids(c)
      var s = 0.0
      val n = math.min(xs.length, p.length)
      var j = 0
      while (j < n) { s += xs(j) * p(j); j += 1 }
      val raw = if (vNorm == 0 || cNorms(c) == 0) 0.0 else s / (vNorm * cNorms(c))
      // NaN (corrupt embedding) ranks last instead of poisoning selection
      scores(c) = if (java.lang.Double.isNaN(raw)) Double.NegativeInfinity else raw
      c += 1
    }
    // selection of top nProbe by (score desc, index asc)
    val k = math.min(nProbe, centroids.length)
    val picked = new Array[Int](k)
    val used = new Array[Boolean](centroids.length)
    var r = 0
    while (r < k) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var idx = 0
      while (idx < scores.length) {
        if (!used(idx) && (best == -1 || scores(idx) > bestScore)) {
          best = idx; bestScore = scores(idx)
        }
        idx += 1
      }
      used(best) = true
      picked(r) = best
      r += 1
    }
    new GenericArrayData(picked)
  }
}
