package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Mutable per-group state: row count + exact element-wise decimal sums.
  * `sums` stays null until the first vector fixes the dimensionality. */
final class VecMeanBuf(var n: Long, var sums: Array[JBigDecimal])

/** Element-wise mean of an `array<double>` column as ONE aggregate over the
  * whole vector — the scale-safe replacement for `posexplode` +
  * `groupBy(key, dim)`, which turns an n-row corpus into an (n x dim)-row
  * shuffle. Here each vector is consumed in place during partial
  * aggregation and only (count, dim exact decimal sums) per group crosses
  * the shuffle — bytes per group, independent of corpus size.
  *
  * Determinism: elements are rounded to 12 decimal places (the same
  * HALF_UP rounding as a cast to `DecimalType(28,12)`) and summed as exact
  * BigDecimals, so the result is identical under any partitioning or
  * aggregation order — double sums would drift with order. The mean is
  * `sum.doubleValue / count`, matching the previous per-dimension decimal
  * formulation bit for bit.
  */
case class VecMeanAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecMeanBuf] {

  override def createAggregationBuffer(): VecMeanBuf = new VecMeanBuf(0L, null)

  override def update(buffer: VecMeanBuf, input: InternalRow): VecMeanBuf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val dim = arr.numElements()
      var hasNull = false
      var i = 0
      while (i < dim && !hasNull) { hasNull = arr.isNullAt(i); i += 1 }
      if (!hasNull) { // a vector with null components is skipped whole
        if (buffer.sums == null)
          buffer.sums = Array.fill(dim)(JBigDecimal.ZERO)
        require(buffer.sums.length == dim,
          s"vec_mean: ragged input — ${buffer.sums.length} vs $dim elements")
        var j = 0
        while (j < dim) {
          buffer.sums(j) = buffer.sums(j).add(
            JBigDecimal.valueOf(arr.getDouble(j)).setScale(12, RoundingMode.HALF_UP))
          j += 1
        }
        buffer.n += 1
      }
    }
    buffer
  }

  override def merge(buffer: VecMeanBuf, other: VecMeanBuf): VecMeanBuf = {
    if (other.sums != null) {
      if (buffer.sums == null) { buffer.sums = other.sums; buffer.n = other.n }
      else {
        require(buffer.sums.length == other.sums.length,
          s"vec_mean: ragged merge — ${buffer.sums.length} vs ${other.sums.length}")
        var j = 0
        while (j < buffer.sums.length) {
          buffer.sums(j) = buffer.sums(j).add(other.sums(j)); j += 1
        }
        buffer.n += other.n
      }
    }
    buffer
  }

  override def eval(buffer: VecMeanBuf): Any =
    if (buffer.sums == null) null
    else new GenericArrayData(buffer.sums.map(_.doubleValue() / buffer.n))

  override def serialize(buffer: VecMeanBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buffer.n)
    out.writeInt(if (buffer.sums == null) -1 else buffer.sums.length)
    if (buffer.sums != null) buffer.sums.foreach { s =>
      val bytes = s.setScale(12, RoundingMode.UNNECESSARY).unscaledValue().toByteArray
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VecMeanBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readLong()
    val dim = in.readInt()
    val sums =
      if (dim < 0) null
      else Array.fill(dim) {
        val b = new Array[Byte](in.readInt())
        in.readFully(b)
        new JBigDecimal(new BigInteger(b), 12)
      }
    new VecMeanBuf(n, sums)
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "vec_mean"

  override def withNewMutableAggBufferOffset(newOffset: Int): VecMeanAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecMeanAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): VecMeanAgg =
    copy(child = newChildren.head)
}

object VecMeanAgg {
  /** Column API: exact-decimal element-wise mean of an array<double> column. */
  def vecMean(c: Column): Column =
    GraftBridge.column(VecMeanAgg(GraftBridge.expression(c)).toAggregateExpression())
}
