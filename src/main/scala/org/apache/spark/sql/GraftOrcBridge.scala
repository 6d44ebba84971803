package org.apache.spark.sql

import org.apache.hadoop.io.WritableComparable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.orc.OrcDeserializer
import org.apache.spark.sql.types.StructType

/** Bridge to the sql-private ORC value deserializer, so graft's DSv2
  * snapshot-table source reuses Spark's own battle-tested ORC->Catalyst
  * conversions (timestamps, decimals, nested types, calendar rebase)
  * instead of re-deriving them. `OrcDeserializer` is `private[sql]`;
  * this wrapper lives in the sql package purely for access. */
object GraftOrcBridge {

  /** `cloneSession()` lives on the classic concrete session (the only
    * kind a local library session is): a clone shares the SparkContext
    * and cache but takes a COPY of the session state (incl. runtime SQL
    * conf), so a caller can tweak per-read planner knobs (e.g.
    * `spark.sql.files.maxPartitionBytes` for a tiny-on-disk,
    * stripe-splittable sidecar) without racing concurrent queries in
    * the original session. */
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .cloneSession()

  /** The classic session's stable UUID — an identity KEY that does not
    * strongly reference the session itself (cache keys built on it
    * never pin a dead session in memory). */
  def sessionUUID(spark: SparkSession): String =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionUUID

  /** Deserializes ORC writable values (one per field of `schema`, in
    * order, null for absent columns) into an InternalRow. The returned
    * row is REUSED across calls — consumers must copy if they buffer. */
  final class RowDeser(schema: StructType) {
    private val d =
      new OrcDeserializer(schema, Array.tabulate(schema.length)(identity))
    def fromValues(values: Seq[WritableComparable[_]]): InternalRow =
      d.deserializeFromValues(values)
  }

  /** Serializes InternalRows to ORC writables with Spark's own
    * OrcSerializer (same type-conversion matrix as the deserializer). */
  final class RowSer(schema: StructType) {
    private val s =
      new execution.datasources.orc.OrcSerializer(schema)
    def toOrc(row: InternalRow): org.apache.orc.mapred.OrcStruct =
      s.serialize(row)
  }

  /** Catalyst schema -> ORC TypeDescription (Spark's own mapping). */
  def orcTypeDescription(schema: StructType): org.apache.orc.TypeDescription =
    execution.datasources.orc.OrcUtils.orcTypeDescription(schema)

  /** ORC TypeDescription -> Catalyst schema (Spark's own mapping) — for
    * readers that must type a sidecar column from its footer alone. */
  def toCatalystSchema(td: org.apache.orc.TypeDescription): StructType =
    execution.datasources.orc.OrcUtils.toCatalystSchema(td)

  /** Spark's own source-Filter -> ORC SearchArgument conversion
    * (row-group / stripe skipping), with its full type-coercion and
    * unconvertible-predicate handling. None when nothing converts. */
  def searchArgument(schema: StructType,
                     filters: Seq[org.apache.spark.sql.sources.Filter])
      : Option[org.apache.hadoop.hive.ql.io.sarg.SearchArgument] =
    execution.datasources.orc.OrcFilters.createFilter(schema, filters)
}
