package graft.sources

import java.sql.{DriverManager, PreparedStatement}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.sources.JdbcSource.JdbcConn

/** JDBC fixture loader: DataFrame -> live database table.
  *
  * Exists because the reference's primary input is a running MySQL server
  * (`/root/reference/data_to_orc_converter.sh:177-295`) and this build
  * environment has none; round-trip tests and the `conv_jdbc_roundtrip`
  * oracle query load the parquet fixtures into embedded Apache Derby
  * (shipped with Spark's jars) and read them back through [[JdbcSource]] —
  * the same engine-generic code path the MySQL config drives.
  *
  * Fixture-scale only: rows pass through the driver (`toLocalIterator`,
  * bounded memory, single-node throughput). Production data lives in the
  * source database already.
  */
object JdbcFixture {

  /** Create `table` in the target database mirroring `df`'s schema and
    * batch-insert every row. Identifiers are quoted with the connection's
    * quote char so case survives engines that fold unquoted names.
    * `primaryKey` (NOT NULL + PK) enables range-partitioned read-back. */
  def loadTable(df: DataFrame, conn: JdbcConn, table: String,
                primaryKey: Option[String] = None,
                batchSize: Int = 500): Unit = {
    val schema = df.schema
    def q(name: String) = JdbcSource.quoteIdent(conn, name)
    val c = DriverManager.getConnection(conn.url, JdbcSource.connectionProps(conn))
    try {
      val colDefs = schema.fields.map { f =>
        val notNull = if (primaryKey.contains(f.name)) " NOT NULL" else ""
        s"${q(f.name)} ${sqlType(f.dataType)}$notNull"
      }
      val pk = primaryKey.map(k => s", PRIMARY KEY (${q(k)})").getOrElse("")
      c.createStatement().executeUpdate(
        s"CREATE TABLE ${q(table)} (${colDefs.mkString(", ")}$pk)")

      val placeholders = schema.fields.map(_ => "?").mkString(", ")
      val st = c.prepareStatement(s"INSERT INTO ${q(table)} VALUES ($placeholders)")
      var inBatch = 0
      val it = df.toLocalIterator()
      while (it.hasNext) {
        val row = it.next()
        schema.fields.zipWithIndex.foreach { case (f, i) =>
          setCell(st, i + 1, f.dataType, if (row.isNullAt(i)) null else row.get(i))
        }
        st.addBatch()
        inBatch += 1
        if (inBatch >= batchSize) { st.executeBatch(); inBatch = 0 }
      }
      if (inBatch > 0) st.executeBatch()
    } finally c.close()
  }

  /** Spark type -> portable SQL DDL (Derby + MySQL dialects share these). */
  def sqlType(dt: DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case ShortType => "SMALLINT"
    case ByteType => "SMALLINT"
    case DoubleType | FloatType => "DOUBLE"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case DateType => "DATE"
    // TIMESTAMP on the wire is tz-less in Derby/MySQL; both Spark flavors
    // (instant TimestampType and wall-clock TimestampNTZType) serialize to
    // it — Spark 4 infers NTZ from parquet when isAdjustedToUTC=false, so
    // fixture tables loaded from parquet routinely carry NTZ columns.
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case BooleanType => "BOOLEAN"
    case BinaryType => "BLOB"
    case StringType => "VARCHAR(1024)"
    case other => throw new IllegalArgumentException(s"no JDBC fixture mapping for $other")
  }

  /** Spark type -> java.sql.Types constant for typed NULLs. Embedded Derby
    * rejects untyped `setObject(i, null)` (SQLState 22005); it requires
    * `setNull` with the JDBC type. */
  private def jdbcType(dt: DataType): Int = dt match {
    case LongType => java.sql.Types.BIGINT
    case IntegerType => java.sql.Types.INTEGER
    case ShortType | ByteType => java.sql.Types.SMALLINT
    case DoubleType | FloatType => java.sql.Types.DOUBLE
    case _: DecimalType => java.sql.Types.DECIMAL
    case DateType => java.sql.Types.DATE
    case TimestampType | TimestampNTZType => java.sql.Types.TIMESTAMP
    case BooleanType => java.sql.Types.BOOLEAN
    case BinaryType => java.sql.Types.BLOB
    case _ => java.sql.Types.VARCHAR
  }

  private def setCell(st: PreparedStatement, idx: Int, dt: DataType, v: Any): Unit =
    (dt, v) match {
      case (_, null) => st.setNull(idx, jdbcType(dt))
      case (LongType, x: Long) => st.setLong(idx, x)
      case (IntegerType, x: Int) => st.setInt(idx, x)
      case (ShortType, x: Short) => st.setShort(idx, x)
      case (ByteType, x: Byte) => st.setShort(idx, x.toShort)
      case (DoubleType, x: Double) => st.setDouble(idx, x)
      case (FloatType, x: Float) => st.setDouble(idx, x.toDouble)
      case (_: DecimalType, x: java.math.BigDecimal) => st.setBigDecimal(idx, x)
      case (DateType, x: java.sql.Date) => st.setDate(idx, x)
      case (TimestampType, x: java.sql.Timestamp) => st.setTimestamp(idx, x)
      case (TimestampNTZType, x: java.time.LocalDateTime) =>
        st.setTimestamp(idx, java.sql.Timestamp.valueOf(x))
      case (BooleanType, x: Boolean) => st.setBoolean(idx, x)
      case (BinaryType, x: Array[Byte]) => st.setBytes(idx, x)
      case (StringType, x: String) => st.setString(idx, x)
      case (t, x) => throw new IllegalArgumentException(s"cell $x does not match $t")
    }
}
