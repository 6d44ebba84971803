package graft.functions

import org.apache.datasketches.hll.{HllSketch, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** Mergeable HLL distinct-count aggregate backed by Apache DataSketches,
  * as a native `TypedImperativeAggregate` — the UDAF extension surface for
  * sketch-shaped state: the sketch object lives mutably in memory during
  * partial aggregation and serializes ONLY at shuffle boundaries
  * (serialize/deserialize below), unlike an `Aggregator[IN, Array[Byte],
  * OUT]` which would round-trip bytes per row.
  *
  * The scale story is mergeability: each executor sketches its partitions
  * independently; unions are associative and tiny (<= ~2.5 KB at lgK=12),
  * so a 100 TB distinct-count costs one scan plus a KB-sized shuffle —
  * this is also how pre-aggregated sketch columns in rollup tables stay
  * combinable across days/partitions. Spark's built-in
  * approx_count_distinct is the same idea fused into one query; this
  * operator exposes the reusable sketch as a first-class aggregate.
  */
case class HllSketchAgg(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllSketch] with ImplicitCastInputTypes {

  // Analysis-time typing: int/short/byte inputs widen to long; strings and
  // other types fail at analysis instead of ClassCastException per task.
  // (Seq[DataType] <: Seq[AbstractDataType]; the parent type is sql-private.)
  override def inputTypes: Seq[DataType] = Seq(LongType)

  override def createAggregationBuffer(): HllSketch = new HllSketch(lgK)

  override def update(buffer: HllSketch, input: InternalRow): HllSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: HllSketch, other: HllSketch): HllSketch = {
    val u = new Union(lgK)
    u.update(buffer)
    u.update(other)
    u.getResult
  }

  override def eval(buffer: HllSketch): Any = Math.round(buffer.getEstimate)

  override def serialize(buffer: HllSketch): Array[Byte] = buffer.toCompactByteArray

  override def deserialize(storageFormat: Array[Byte]): HllSketch = {
    // heapified compact sketches are read-only; route through a Union to
    // get an updatable buffer back
    val u = new Union(lgK)
    u.update(HllSketch.heapify(storageFormat))
    u.getResult
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "hll_sketch_distinct"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HllSketchAgg =
    copy(child = newChildren.head)
}

object HllSketchAgg {
  /** Column API: approximate distinct count of a long column. */
  def hllDistinct(c: Column, lgK: Int = 12): Column =
    GraftBridge.column(
      HllSketchAgg(GraftBridge.expression(c), lgK).toAggregateExpression())
}
