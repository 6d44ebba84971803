package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Random-hyperplane LSH buckets for all L tables in one compiled pass:
  * bucket(t) = sign bits of the vector's projections onto table t's
  * planes. Replaces the interpreted array-of-structs formulation in the
  * ANN path (L*nBits VecDot calls wrapped in higher-order array ops) with
  * one tight loop over a reference-object plane tensor. */
case class LshBits(child: Expression, planes: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "lsh_bits"

  override def nullSafeEval(input: Any): Any =
    LshBits.buckets(input.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshPlanes", planes, "double[][][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.LshBits.buckets($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBits =
    copy(child = newChild)

  // Array fields break case-class equality/hash; identity by content.
  override def equals(o: Any): Boolean = o match {
    case other: LshBits =>
      child == other.child &&
        planes.length == other.planes.length &&
        java.util.Arrays.deepEquals(
          planes.asInstanceOf[Array[AnyRef]], other.planes.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.deepHashCode(planes.asInstanceOf[Array[AnyRef]])
}

object LshBits {

  def lshBits(c: Column, planes: Seq[Seq[Seq[Double]]]): Column =
    GraftBridge.column(LshBits(GraftBridge.expression(c),
      planes.map(_.map(_.toArray).toArray).toArray))

  /** Static entry point for interpreted eval and generated code. */
  def buckets(vec: ArrayData, planes: Array[Array[Array[Double]]]): ArrayData = {
    val xs = vec.toDoubleArray()
    val out = new Array[Int](planes.length)
    var t = 0
    while (t < planes.length) {
      val tablePlanes = planes(t)
      var bucket = 0
      var b = 0
      while (b < tablePlanes.length) {
        val p = tablePlanes(b)
        var s = 0.0
        val n = math.min(xs.length, p.length)
        var i = 0
        while (i < n) { s += xs(i) * p(i); i += 1 }
        if (s > 0) bucket |= (1 << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}
