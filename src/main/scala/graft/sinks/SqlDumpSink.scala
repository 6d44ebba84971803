package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.SqlDumpFixture

/** Distributed mysqldump-style EXPORT sink — the reverse of
  * [[graft.sources.SqlDumpSource]], completing the dump format's
  * read/write symmetry the way `Cli export` already does for
  * csv/jsonl/parquet.
  *
  * Unlike [[SqlDumpFixture.writeDump]] (driver-side, fixture-scale), this
  * writes through the executors: each row's SQL tuple literal is built by
  * a codegen'd Column expression (escaping, NULLs, hex for binary — no
  * UDF), partitions batch their tuples into multi-row INSERT statements,
  * and the result lands as `<outDir>/<table>/part-*.txt` text parts next
  * to a driver-written `0000_schema.sql` DDL header. At 100 TB the export
  * is a map-only pass — no shuffle, one part per task.
  *
  * Statement framing: every statement ends `;\n` and all raw newlines
  * inside string values are escaped (`\n`/`\r`), so the whole directory
  * re-parses with SqlDumpSource's distributed `;\n`-delimited statement
  * scan — CREATE TABLE in one part, INSERTs across the rest, order-free.
  */
object SqlDumpSink {

  /** SQL literal for one column under its Spark type: quoted/escaped
    * strings (backslash first, then quote, newline, CR — matching the
    * tokenizer's unescape), 1/0 booleans, quoted formatted dates and
    * microsecond timestamps, 0x hex for binary, plain text for numerics,
    * NULL for null. Pure string expressions — whole-stage codegen. */
  def sqlLiteral(c: Column, dt: DataType): Column = {
    val rendered = dt match {
      case StringType =>
        val esc = regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(c, "\\\\", "\\\\\\\\"),
              "'", "\\\\'"),
            "\n", "\\\\n"),
          "\r", "\\\\r")
        concat(lit("'"), esc, lit("'"))
      case BooleanType => when(c, lit("1")).otherwise(lit("0"))
      case DateType =>
        concat(lit("'"), date_format(c, "yyyy-MM-dd"), lit("'"))
      case TimestampType | TimestampNTZType =>
        concat(lit("'"), date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS"), lit("'"))
      // empty bytes: '0x' with no digits is not a legal hex literal —
      // mysqldump's form for an empty blob is the empty string literal
      case BinaryType =>
        when(length(c) === 0, lit("''")).otherwise(concat(lit("0x"), hex(c)))
      case _ => c.cast("string")
    }
    when(c.isNull, lit("NULL")).otherwise(rendered)
  }

  /** Export `df` as `<outDir>/<table>/` — `0000_schema.sql` (DDL) +
    * text parts of batched INSERT statements. Returns (rows, files).
    * `typeOverrides` pins declared MySQL column types (else
    * [[SqlDumpFixture.defaultMysqlType]]). */
  def write(df: DataFrame, outDir: String, table: String,
            rowsPerInsert: Int = 500,
            typeOverrides: Map[String, String] = Map.empty): (Long, Int) = {
    require(rowsPerInsert > 0)
    val spark = df.sparkSession
    val dir = s"$outDir/$table"
    val schema = df.schema
    val tupleCol = concat(
      lit("("),
      concat_ws(",", schema.fields.map(f => sqlLiteral(col(f.name), f.dataType)): _*),
      lit(")"))
    val colList = schema.fields.map(f => s"`${f.name}`").mkString(" (", ",", ")")
    val header = s"INSERT INTO `$table`$colList VALUES\n"
    import spark.implicits._
    val tuples = df.select(tupleCol.as("t")).as[String]
    // batch tuples into multi-row INSERTs per partition (the one
    // inherently imperative step — grouping k consecutive strings; the
    // per-row literal formatting above stays codegen'd)
    val stmts = tuples.mapPartitions { it =>
      it.grouped(rowsPerInsert).map(b => header + b.mkString(",\n") + ";")
    }
    // the text writer appends '\n' per record, completing the ';\n'
    // statement delimiter the distributed re-parse splits on
    stmts.write.mode("overwrite").text(dir)

    // DDL header, driver-written (one CREATE TABLE — metadata, not data).
    // '0000_' (no leading underscore): hidden-file rules would drop an
    // '_schema.sql' from the re-parse's input listing.
    val declared = schema.fields.map(f =>
      f.name -> typeOverrides.getOrElse(f.name,
        SqlDumpFixture.defaultMysqlType(f.dataType))).toMap
    val ddl = schema.fields.map(f => s"  `${f.name}` ${declared(f.name)}")
      .mkString(s"CREATE TABLE `$table` (\n", ",\n", "\n);\n")
    val ddlPath = new Path(dir, "0000_schema.sql")
    val fs = ddlPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(ddlPath, true)
    try out.write(("-- graft dump export\n" + ddl).getBytes("UTF-8"))
    finally out.close()

    val it = fs.listFiles(new Path(dir), false)
    var files = 0
    while (it.hasNext) {
      val n = it.next().getPath.getName
      if (!n.startsWith("_") && !n.startsWith(".")) files += 1
    }
    (df.count(), files)
  }
}
