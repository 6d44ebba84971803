package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sinks.SnapshotTable

/** Path-based catalog over snapshot tables — the Delta `delta.`/path/``
  * shape, registered once per session:
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.graft",
  *   "graft.sources.SnapshotTableCatalog")
  * spark.sql("SELECT * FROM graft.`/data/events` VERSION AS OF 3")
  * spark.sql("SELECT * FROM graft.`/data/events` TIMESTAMP AS OF '...'")
  * spark.sql("INSERT INTO graft.`/data/events` SELECT ...")
  * }}}
  *
  * The backticked identifier IS the table directory; `VERSION AS OF` /
  * `TIMESTAMP AS OF` resolve through the commit log's version numbers
  * and write-time-monotonized stamps (Spark hands timestamps down in
  * MICROseconds). Tables are created by the first
  * [[SnapshotTable.commit]] (or `cli table commit`), not by DDL, so the
  * mutation surface here is intentionally read+insert only.
  */
class SnapshotTableCatalog extends TableCatalog {

  private var catalogName: String = "graft"

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  private def dirOf(ident: Identifier): String = {
    // `graft.`/tmp/t`` parses to namespace=[] name="/tmp/t"; a dotted
    // multi-part identifier is not a path table
    if (ident.namespace().nonEmpty) throw new NoSuchTableException(ident)
    ident.name()
  }

  private def table(ident: Identifier,
                    extra: Map[String, String]): Table = {
    val spark = SparkSession.active
    val dir = dirOf(ident)
    if (SnapshotTable.versions(spark, dir).isEmpty)
      throw new NoSuchTableException(ident)
    val opts = new java.util.HashMap[String, String]()
    opts.put("path", dir)
    extra.foreach { case (k, v) => opts.put(k, v) }
    val cis = new CaseInsensitiveStringMap(opts)
    val schema = new SnapshotTableProvider().inferSchema(cis)
    new SnapshotTableTable(schema, dir, cis)
  }

  override def loadTable(ident: Identifier): Table = table(ident, Map.empty)

  /** SQL `VERSION AS OF <v>`. */
  override def loadTable(ident: Identifier, version: String): Table =
    table(ident, Map("versionAsOf" -> version))

  /** SQL `TIMESTAMP AS OF <ts>` — Spark passes MICROseconds. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table =
    table(ident, Map("timestampAsOf" -> (timestampMicros / 1000L).toString))

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace().isEmpty &&
      SnapshotTable.versions(SparkSession.active, ident.name()).nonEmpty

  // path catalog: there is no namespace to enumerate
  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: JMap[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft tables are created by the first SnapshotTable.commit / " +
        "`cli table commit`, not by DDL")

  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "schema evolves through commits (merge-by-name), not ALTER TABLE")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "destroying a table is expire+vacuum, an operator action — " +
        "DROP TABLE is deliberately unsupported")

  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "a path table's name IS its location; move the directory instead")
}
