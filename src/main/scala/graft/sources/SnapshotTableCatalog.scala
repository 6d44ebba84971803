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
  * [[SnapshotTable.commit]] (or `cli table commit`), not by DDL. The
  * mutation surface is INSERT + row-level DML (via the table's
  * row-level-operation support) + `ALTER TABLE ADD COLUMNS`/
  * `DROP COLUMN` (see [[alterTable]] — both zero-data-I/O log commits);
  * DROP/RENAME TABLE stay operator actions.
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

  /** SQL schema DDL, both directions zero-data-I/O log commits:
    *
    *   - `ADD COLUMNS (c T, ...)`: one empty APPEND commit recording the
    *     widened schema — replay's merge-by-name does the rest (files
    *     written before the column null-fill it). New columns must be
    *     nullable for exactly that reason.
    *   - `DROP COLUMN c`: schema narrowing cannot ride merge-by-name
    *     (it only widens), so the drop publishes ONE overwrite commit
    *     carrying the SAME file and delete entries under the narrowed
    *     recorded schema — byte-free, version-pinned (an interleaved
    *     commit fails it loudly), and the pre-drop version stays
    *     time-travel-readable with the column intact. Dropping a column
    *     that keys a pending merge-on-read delete is refused (the
    *     delete would silently stop applying) — compact first. ADD of
    *     a previously-dropped name is refused while any live file still
    *     physically holds the old values (footer-checked): by-name
    *     matching would resurrect them — compact to shed, then re-add.
    *
    * Renames/retypes need column mapping and stay unsupported. */
  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table = {
    // BOTH DDL paths pin the version they read (ADVICE r14: an unpinned
    // ADD publish racing a DROP overwrite would re-record the dropped
    // column via merge-by-name and resurrect its physically-present
    // values). A lost race re-runs the WHOLE alter — schema re-read,
    // ghost re-check — against the fresh snapshot, a few times, then
    // fails loudly.
    var attempts = 0
    while (true) {
      try return alterOnce(ident, changes)
      catch {
        case e: java.util.ConcurrentModificationException =>
          attempts += 1
          if (attempts > 3) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def alterOnce(ident: Identifier,
                        changes: Seq[TableChange]): Table = {
    val spark = SparkSession.active
    val dir = dirOf(ident)
    if (SnapshotTable.versions(spark, dir).isEmpty)
      throw new NoSuchTableException(ident)
    val readVersion = SnapshotTable.currentVersion(spark, dir).get
    var schema = SnapshotTable.snapshotSchema(spark, dir,
      Some(readVersion)).getOrElse(
      throw new UnsupportedOperationException(
        s"$dir predates schema recording — ALTER TABLE needs a recorded " +
          "snapshot schema; evolve it through one commit first"))
    var dropped = false
    changes.foreach {
      case add: TableChange.AddColumn =>
        if (add.fieldNames().length != 1)
          throw new UnsupportedOperationException(
            "nested ADD COLUMN is unsupported")
        val n = add.fieldNames().head
        require(!schema.fieldNames.contains(n),
          s"column '$n' already exists in $dir")
        require(add.isNullable,
          s"new column '$n' must be nullable — rows written before it " +
            "exists null-fill it")
        // by-name matching has no column mapping: if any LIVE data file
        // PHYSICALLY contains this name (written before a DROP COLUMN),
        // re-adding it would silently RESURRECT the dropped values into
        // the new column. One distributed footer-only sweep (the same
        // O(#files) cost as any commit's stats harvest, for a rare DDL)
        // guards it; compact first to physically shed the old column.
        val live = SnapshotTable.snapshotFiles(spark, dir,
          Some(readVersion))
        val ghosts = SnapshotTable.harvest(spark,
          live.map(e => s"$dir/${e.path}"), Seq(n))
          .count(_.stats.contains(n))
        require(ghosts == 0,
          s"column '$n' still exists physically in $ghosts live data " +
            s"file(s) of $dir (written before a DROP COLUMN) — re-adding " +
            "it would resurrect the dropped values; compact the table " +
            "to shed them first")
        schema = StructType(schema.fields :+
          org.apache.spark.sql.types.StructField(n, add.dataType(),
            nullable = true))
      case del: TableChange.DeleteColumn =>
        if (del.fieldNames().length != 1)
          throw new UnsupportedOperationException(
            "nested DROP COLUMN is unsupported")
        val n = del.fieldNames().head
        if (!schema.fieldNames.contains(n)) {
          if (!del.ifExists())
            throw new IllegalArgumentException(s"no column '$n' in $dir")
        } else {
          require(schema.fields.length > 1,
            s"cannot drop the last column of $dir")
          require(!SnapshotTable.pendingDeletes(spark, dir)
              .exists(_.keyCol == n),
            s"column '$n' keys a pending merge-on-read delete — compact " +
              "to materialize it before dropping the column")
          schema = StructType(schema.fields.filterNot(_.name == n))
          dropped = true
        }
      case other => throw new UnsupportedOperationException(
        "unsupported ALTER TABLE change for graft tables " +
          s"(schema otherwise evolves through commits): $other")
    }
    if (dropped) {
      val (files, dels) = SnapshotTable.snapshotState(spark, dir,
        Some(readVersion))
      SnapshotTable.publish(spark, dir, "overwrite", files,
        maxRetries = 3, schemaJson = Some(schema.json),
        expectedVersion = Some(readVersion), deletes = dels)
    } else {
      // version-pinned like the DROP path: a lost race re-enters the
      // publish loop where the expectedVersion guard turns it into CME,
      // and alterTable re-derives the schema from the fresh snapshot
      SnapshotTable.publish(spark, dir, "append", Nil, maxRetries = 3,
        schemaJson = Some(schema.json),
        expectedVersion = Some(readVersion))
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "destroying a table is expire+vacuum, an operator action — " +
        "DROP TABLE is deliberately unsupported")

  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "a path table's name IS its location; move the directory instead")
}
