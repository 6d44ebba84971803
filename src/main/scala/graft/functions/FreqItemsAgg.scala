package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Misra-Gries heavy-hitters aggregate (public algorithm:
  * Misra & Gries 1982; merge rule per Agarwal et al. 2013, "Mergeable
  * Summaries"): maintain at most `k` counters; an unseen item with all
  * counters occupied decrements every counter (dropping zeros) instead
  * of being stored. Guarantees, for stream length n: every item with
  * true frequency > n/(k+1) is present, and each reported estimate
  * undercounts its true frequency by at most the summary's total
  * decrement (<= n/(k+1)).
  *
  * The scale story matches [[HllSketchAgg]]: each executor summarizes
  * its partitions independently, merges are associative (pairwise
  * counter addition followed by the same k-bound decrement, which
  * preserves the error bound — this is what makes the sketch usable as
  * a pre-aggregated rollup column), and the shuffle carries <= k
  * (item, count) pairs per partial instead of the full vocabulary. With
  * k >= the true distinct count the summary never decrements and the
  * counts are EXACT — the property the correctness gate pins.
  *
  * Completes the classic mergeable-sketch trio alongside the HLL
  * distinct gate (q24) and the quantile-sketch gate (q29). */
case class FreqItemsAgg(
    child: Expression,
    k: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with ImplicitCastInputTypes {

  require(k > 0, s"k must be positive, got $k")

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  private def offer(buf: mutable.HashMap[String, Long], item: String,
                    weight: Long): Unit = {
    val cur = buf.getOrElse(item, 0L)
    if (cur > 0L || buf.size < k) buf.update(item, cur + weight)
    else {
      // decrement phase: an unseen item with k counters occupied cancels
      // one unit of every counter per unit of its own weight
      val dec = math.min(weight, buf.valuesIterator.min)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.mapValuesInPlace((_, c) => c - dec)
      buf.foreach { case (i, c) => if (c <= 0L) dead += i }
      dead.foreach(buf.remove)
      val rest = weight - dec
      if (rest > 0L && buf.size < k) buf.update(item, rest)
    }
  }

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (item, c) => offer(buf, item, c) }
    buf
  }

  /** map<string, long> of surviving counters. */
  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val items = buf.toSeq.sortBy { case (i, c) => (-c, i) }
    new ArrayBasedMapData(
      new GenericArrayData(items.map(p => UTF8String.fromString(p._1)).toArray[Any]),
      new GenericArrayData(items.map(_._2).toArray[Any]))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (i, c) =>
      val b = i.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt(); val b = new Array[Byte](len); in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "freq_items"

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FreqItemsAgg =
    copy(child = newChildren.head)
}

object FreqItemsAgg {
  /** Column API: Misra-Gries summary (map item -> estimated count). */
  def freqItems(c: Column, k: Int = 64): Column =
    GraftBridge.column(
      FreqItemsAgg(GraftBridge.expression(c), k).toAggregateExpression())
}
