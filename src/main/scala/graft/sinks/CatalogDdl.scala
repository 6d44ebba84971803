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
    * emitted verbatim (qualify with a scheme for remote filesystems). */
  def ddl(tableName: String, schema: StructType, location: String,
          dialect: String): String = {
    require(Dialects.contains(dialect),
      s"unknown DDL dialect '$dialect' (expected one of $Dialects)")
    // single quotes in the location would end the SQL string literal
    val loc = location.replace("'", "''")
    dialect match {
      case "spark" =>
        val cols = schema.fields
          .map(f => s"  `${f.name}` ${hiveType(f.dataType)}")
          .mkString(",\n")
        s"CREATE TABLE IF NOT EXISTS `$tableName` (\n$cols\n) USING ORC LOCATION '$loc'"
      case "hive" =>
        val cols = schema.fields
          .map(f => s"  `${f.name}` ${hiveType(f.dataType)}")
          .mkString(",\n")
        s"CREATE EXTERNAL TABLE IF NOT EXISTS `$tableName` (\n$cols\n) STORED AS ORC\nLOCATION '$loc'"
      case "trino" =>
        val cols = schema.fields
          .map(f => s"""  "${f.name}" ${trinoType(f.dataType)}""")
          .mkString(",\n")
        s"""CREATE TABLE IF NOT EXISTS "$tableName" (\n$cols\n) WITH (format = 'ORC', external_location = '$loc')"""
    }
  }

  /** DDL for one converted table directory, schema read from its ORC
    * footers. */
  def forTableDir(spark: SparkSession, dir: String, tableName: String,
                  dialect: String): String = {
    val qualified = {
      val p = new Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .makeQualified(p).toString
    }
    ddl(tableName, spark.read.orc(dir).schema, qualified, dialect)
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
      .filter(d => fs.listStatus(d.getPath).exists(f =>
        f.isFile && f.getPath.getName.startsWith("part-")))
      .map(d => d.getPath.getName)
      .sorted
      .map(name => name ->
        forTableDir(spark, s"$outDir/$name", name, dialect))
  }
}
