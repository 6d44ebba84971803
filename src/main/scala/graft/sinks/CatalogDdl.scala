package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** External-catalog DDL emitter for converted table directories — the
  * read-back half of the reference's documented integrations: its README
  * shows the converted `outdir/<table>/part-*.orc` directories being
  * mounted as EXTERNAL tables in Presto and Spark for downstream SQL
  * (reference README.md:191-218). The reference leaves writing that DDL
  * to the user; this emits it from the ORC files' own schema, so the
  * mount can never drift from what was actually written.
  *
  * Three dialects:
  *   - `spark`: `CREATE TABLE ... USING ORC LOCATION ...` — Spark's
  *     native unmanaged-table form, runnable on any catalog (no Hive
  *     metastore needed); DROP never touches the data files.
  *   - `hive`: `CREATE EXTERNAL TABLE ... STORED AS ORC LOCATION ...` —
  *     the classic metastore form Presto/Trino's hive connector reads.
  *   - `trino`: `CREATE TABLE ... WITH (format='ORC',
  *     external_location=...)` — Trino/Presto-SQL's own syntax.
  *
  * Schema source: the ORC footers via `spark.read.orc` (merged across
  * part files), i.e. the schema the converter actually wrote — not the
  * source system's declared one, which may have been widened/evolved. */
object CatalogDdl {

  /** Spark/Hive type name for `dt` (shared except for the string/binary
    * spellings Trino renames). Fails loudly on types external engines
    * cannot mount rather than emitting DDL that breaks at query time. */
  private def hiveType(dt: DataType): String = dt match {
    case ByteType => "TINYINT"
    case ShortType => "SMALLINT"
    case IntegerType => "INT"
    case LongType => "BIGINT"
    case FloatType => "FLOAT"
    case DoubleType => "DOUBLE"
    case BooleanType => "BOOLEAN"
    case StringType => "STRING"
    case BinaryType => "BINARY"
    case DateType => "DATE"
    case _: TimestampType => "TIMESTAMP"
    case _: TimestampNTZType => "TIMESTAMP"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case ArrayType(e, _) => s"ARRAY<${hiveType(e)}>"
    case MapType(k, v, _) => s"MAP<${hiveType(k)},${hiveType(v)}>"
    case StructType(fs) =>
      fs.map(f => s"`${f.name}`:${hiveType(f.dataType)}")
        .mkString("STRUCT<", ",", ">")
    case other => throw new IllegalArgumentException(
      s"no external-catalog mapping for Spark type $other")
  }

  private def trinoType(dt: DataType): String = dt match {
    case ByteType => "TINYINT"
    case ShortType => "SMALLINT"
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case FloatType => "REAL"
    case DoubleType => "DOUBLE"
    case BooleanType => "BOOLEAN"
    case StringType => "VARCHAR"
    case BinaryType => "VARBINARY"
    case DateType => "DATE"
    case _: TimestampType => "TIMESTAMP"
    case _: TimestampNTZType => "TIMESTAMP"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case ArrayType(e, _) => s"ARRAY(${trinoType(e)})"
    case MapType(k, v, _) => s"MAP(${trinoType(k)},${trinoType(v)})"
    case StructType(fs) =>
      fs.map(f => s""""${f.name}" ${trinoType(f.dataType)}""")
        .mkString("ROW(", ",", ")")
    case other => throw new IllegalArgumentException(
      s"no Trino type mapping for Spark type $other")
  }

  val Dialects: Set[String] = Set("spark", "hive", "trino")

  /** DDL mounting the ORC directory `location` as external table
    * `tableName` with `schema`. `location` should be absolute; it is
    * emitted verbatim (qualify with a scheme for remote filesystems).
    *
    * `partitionCols` (in layout order) marks columns materialized as
    * Hive-style `key=value/` directories rather than ORC columns. They
    * must be present in `schema` (partition discovery appends them); the
    * emitted DDL splits them per dialect's own contract:
    *   - spark: all columns in the list + `PARTITIONED BY (names)`
    *   - hive: partition columns EXCLUDED from the list, typed in
    *     `PARTITIONED BY (name TYPE, ...)`
    *   - trino: partition columns LAST in the list (a hive-connector
    *     requirement) + `partitioned_by = ARRAY[...]`
    * Mounting a partitioned location registers ZERO partitions until the
    * metastore is synced — pair with [[repairStatement]]. */
  def ddl(tableName: String, schema: StructType, location: String,
          dialect: String, partitionCols: Seq[String] = Nil): String = {
    require(Dialects.contains(dialect),
      s"unknown DDL dialect '$dialect' (expected one of $Dialects)")
    val missing = partitionCols.filterNot(schema.fieldNames.contains)
    require(missing.isEmpty,
      s"partition columns not in schema: ${missing.mkString(",")}")
    // single quotes in the location would end the SQL string literal
    val loc = location.replace("'", "''")
    val pSet = partitionCols.toSet
    val dataFields = schema.fields.filterNot(f => pSet.contains(f.name))
    val partFields = partitionCols
      .map(c => schema.fields.find(_.name == c).get)
    dialect match {
      case "spark" =>
        val cols = schema.fields
          .map(f => s"  `${f.name}` ${hiveType(f.dataType)}")
          .mkString(",\n")
        val part = if (partitionCols.isEmpty) ""
          else partitionCols.map(c => s"`$c`")
            .mkString(" PARTITIONED BY (", ", ", ")")
        s"CREATE TABLE IF NOT EXISTS `$tableName` (\n$cols\n) USING ORC$part LOCATION '$loc'"
      case "hive" =>
        val cols = dataFields
          .map(f => s"  `${f.name}` ${hiveType(f.dataType)}")
          .mkString(",\n")
        val part = if (partFields.isEmpty) ""
          else partFields
            .map(f => s"`${f.name}` ${hiveType(f.dataType)}")
            .mkString("\nPARTITIONED BY (", ", ", ")")
        s"CREATE EXTERNAL TABLE IF NOT EXISTS `$tableName` (\n$cols\n)$part STORED AS ORC\nLOCATION '$loc'"
      case "trino" =>
        val cols = (dataFields ++ partFields)
          .map(f => s"""  "${f.name}" ${trinoType(f.dataType)}""")
          .mkString(",\n")
        val part = if (partitionCols.isEmpty) ""
          else partitionCols.map(c => s"'$c'")
            .mkString(", partitioned_by = ARRAY[", ", ", "]")
        s"""CREATE TABLE IF NOT EXISTS "$tableName" (\n$cols\n) WITH (format = 'ORC', external_location = '$loc'$part)"""
    }
  }

  /** Post-CREATE statement that registers the on-disk `key=value/`
    * directories as catalog partitions — without it a freshly mounted
    * partitioned location answers every query with zero rows. None for
    * unpartitioned tables (nothing to sync).
    *   - spark/hive: `MSCK REPAIR TABLE` (Spark also accepts
    *     `ALTER TABLE ... RECOVER PARTITIONS`)
    *   - trino: the hive connector's sync procedure; `<schema>` is the
    *     catalog schema the table was created in. */
  def repairStatement(tableName: String, dialect: String,
                      partitioned: Boolean): Option[String] = {
    require(Dialects.contains(dialect),
      s"unknown DDL dialect '$dialect' (expected one of $Dialects)")
    if (!partitioned) None
    else Some(dialect match {
      case "spark" | "hive" => s"MSCK REPAIR TABLE `$tableName`"
      case "trino" =>
        s"CALL system.sync_partition_metadata(schema_name => '<schema>', table_name => '$tableName', mode => 'ADD')"
    })
  }

  /** Partition columns of a Hive-style layout, in directory order:
    * the `key=value` path segments between `dir` and its first data
    * file. Empty for a flat `part-*.orc` directory. One directory walk,
    * no data reads — the same discovery contract Spark's own reader
    * applies, sampled from a single leaf path. */
  def detectPartitionCols(spark: SparkSession, dir: String): Seq[String] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def firstLeaf(p: Path, acc: Seq[String]): Option[Seq[String]] = {
      val children = fs.listStatus(p).toSeq
        .filterNot(s => s.getPath.getName.startsWith("_") ||
          s.getPath.getName.startsWith("."))
      if (children.exists(_.isFile)) Some(acc)
      else children.filter(_.isDirectory).sortBy(_.getPath.getName)
        .iterator
        .flatMap { d =>
          val n = d.getPath.getName
          val eq = n.indexOf('=')
          if (eq <= 0) None // not key=value: flat subdir, no partitioning
          else firstLeaf(d.getPath, acc :+ n.substring(0, eq))
        }
        .nextOption()
    }
    if (!fs.exists(root)) Nil else firstLeaf(root, Nil).getOrElse(Nil)
  }

  /** DDL for one converted table directory, schema read from its ORC
    * footers (footers are MERGED across part files — a directory whose
    * parts evolved extra columns emits the union, not one sampled
    * footer's subset). Hive-style `key=value/` partition directories are
    * auto-detected and emitted as partition columns. */
  def forTableDir(spark: SparkSession, dir: String, tableName: String,
                  dialect: String): String = {
    val qualified = {
      val p = new Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .makeQualified(p).toString
    }
    // mergeSchema: spark.read.orc samples ONE footer by default
    // (spark.sql.orc.mergeSchema=false) — evolved columns would vanish
    val schema = spark.read.option("mergeSchema", "true").orc(dir).schema
    ddl(tableName, schema, qualified, dialect,
      detectPartitionCols(spark, dir))
  }

  /** One DDL statement per table directory under a conversion output dir
    * (the `outdir/<table>/part-*.orc` contract): every direct child
    * directory containing at least one ORC part file becomes a table
    * named after the directory. Returns (tableName, ddl), sorted. */
  def forOutputDir(spark: SparkSession, outDir: String,
                   dialect: String): Seq[(String, String)] = {
    val root = new Path(outDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      // a table dir holds part files directly, or (partitioned layout)
      // key=value subdirectories holding them
      .filter(d => fs.listStatus(d.getPath).exists(f =>
        (f.isFile && f.getPath.getName.startsWith("part-")) ||
          (f.isDirectory && f.getPath.getName.indexOf('=') > 0)))
      .map(d => d.getPath.getName)
      .sorted
      .map(name => name ->
        forTableDir(spark, s"$outDir/$name", name, dialect))
  }
}
