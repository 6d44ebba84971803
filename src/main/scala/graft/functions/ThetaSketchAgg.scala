package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Mergeable Theta sketch aggregate (Apache DataSketches) emitting the
  * COMPACT SKETCH BYTES, not just an estimate — the sketch that supports
  * SET OPERATIONS: unlike HLL (union only), theta sketches intersect and
  * difference, so two slices' sketches answer "how many distinct items do
  * these sources SHARE" without ever joining them — the cross-source
  * duplicate-mass / contamination-overlap estimator at 100 TB, where the
  * exact distinct-intersection is a corpus-scale join.
  *
  * Same executor mechanics as [[HllSketchAgg]]: the Union buffer lives
  * mutably in memory during partial aggregation and serializes only at
  * shuffle boundaries. Determinism: a theta sketch retains the k SMALLEST
  * item hashes — a set property, independent of arrival order and
  * partitioning — so the compact bytes (ordered form) are identical on
  * any cluster topology, and every estimate derived from them is too.
  * With fewer than k distinct items the sketch is in exact mode.
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType)

  private def newUnion(): Union =
    SetOperation.builder().setNominalEntries(1 << lgK).buildUnion()

  override def createAggregationBuffer(): Union = newUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  // ordered compact form: canonical bytes for the retained-hash set
  override def eval(buffer: Union): Any =
    buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(storageFormat: Array[Byte]): Union = {
    val u = newUnion()
    u.union(CompactSketch.heapify(Memory.wrap(storageFormat)))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "theta_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = newChildren.head)
}

object ThetaSketchAgg {
  /** Column API: compact theta sketch bytes over a long column. */
  def thetaSketch(c: Column, lgK: Int = 12): Column =
    GraftBridge.column(
      ThetaSketchAgg(GraftBridge.expression(c), lgK).toAggregateExpression())

  /** Driver-side set algebra over compact sketch bytes. */
  def heapify(bytes: Array[Byte]): Sketch =
    CompactSketch.heapify(Memory.wrap(bytes))

  def estimate(bytes: Array[Byte]): Double = heapify(bytes).getEstimate

  def intersectionEstimate(a: Array[Byte], b: Array[Byte], lgK: Int = 12): Double = {
    val i = SetOperation.builder().setNominalEntries(1 << lgK).buildIntersection()
    i.intersect(heapify(a))
    i.intersect(heapify(b))
    i.getResult.getEstimate
  }

  def unionEstimate(a: Array[Byte], b: Array[Byte], lgK: Int = 12): Double = {
    val u = SetOperation.builder().setNominalEntries(1 << lgK).buildUnion()
    u.union(heapify(a))
    u.union(heapify(b))
    u.getResult.getEstimate
  }
}
