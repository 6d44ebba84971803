package graft.sources

import java.sql.{Connection, DriverManager}
import java.util.Properties

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{IntegerType, LongType, ShortType, ByteType}

/** MySQL/JDBC source replacing the reference's chunked LIMIT/OFFSET export
  * (`/root/reference/data_to_orc_converter.sh:177-295`).
  *
  * Defects fixed by construction (SURVEY.md §4.3):
  *  - O(n²) pagination: `LIMIT k OFFSET n` rescans n rows server-side per
  *    chunk (sh:236). Replaced with JDBC range partitioning
  *    (`partitionColumn`/`lowerBound`/`upperBound`/`numPartitions`) — each
  *    partition is one indexed range scan; falls back to a single
  *    fetch-streamed partition when no integral key exists.
  *  - Thread-unsafe shared connection (sh:205-208 + 260-264): Spark JDBC
  *    opens one connection per partition.
  *  - SQL injection/identifier quoting (sh:216, 236): identifiers are
  *    backtick-quoted; credentials travel in connection Properties, not
  *    argv-interpolated SQL.
  *
  * The declared MySQL→ORC type mapping (reference README.md:252-259) is
  * honored by `applyDeclaredTypeMapping`: INT family → LONG; DECIMAL /
  * DATE / DATETIME arrive precision-preserving through JDBC metadata
  * (strictly better than the reference's pandas float64 degradation).
  *
  * Scale posture: `CHUNK_SIZE` (reference README.md:162, declared-but-dead
  * there, honored here) maps to `fetchsize` (MySQL streaming cursor) and
  * rows-per-partition sizing; parallelism is numPartitions across
  * executors, not a 4-thread driver pool.
  *
  * NOTE: no MySQL server or driver jar exists in this build environment, so
  * runtime behavior is exercised only on a live cluster; everything here is
  * config/plan construction + the type-mapping transform, which unit tests
  * cover without a live database.
  */
object JdbcSource {

  final case class MySqlConfig(
      host: String,
      port: Int = 3306,
      user: String,
      password: String,
      database: String,
      chunkSize: Int = 50000, // reference default, sh:192
      numPartitions: Int = 8)

  def url(cfg: MySqlConfig): String =
    s"jdbc:mysql://${cfg.host}:${cfg.port}/${cfg.database}" +
      "?useUnicode=true&characterEncoding=utf8mb4&zeroDateTimeBehavior=convertToNull"

  def connectionProps(cfg: MySqlConfig): Properties = {
    val p = new Properties()
    p.setProperty("user", cfg.user)
    p.setProperty("password", cfg.password)
    p.setProperty("fetchsize", cfg.chunkSize.toString)
    p
  }

  /** Backtick-quote an identifier (defence for sh:216/236's f-strings). */
  def quoteIdent(name: String): String = "`" + name.replace("`", "``") + "`"

  /** Connection probe (reference `test_mysql_connection`, sh:583-589). */
  def testConnection(cfg: MySqlConfig): Try[Unit] = Try {
    val c = DriverManager.getConnection(url(cfg), connectionProps(cfg))
    try { c.isValid(5); () } finally c.close()
  }

  /** Catalog listing (reference `SHOW TABLES`, sh:570-580) via
    * information_schema — returns base tables only. */
  def tableList(cfg: MySqlConfig): Try[Seq[String]] = Try {
    val c = DriverManager.getConnection(url(cfg), connectionProps(cfg))
    try {
      val st = c.prepareStatement(
        "SELECT table_name FROM information_schema.tables " +
          "WHERE table_schema = ? AND table_type = 'BASE TABLE' ORDER BY table_name")
      st.setString(1, cfg.database)
      val rs = st.executeQuery()
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      while (rs.next()) out += rs.getString(1)
      out.toSeq
    } finally c.close()
  }

  /** Row count (reference `get_table_row_count`, sh:214-219), pushed down. */
  def rowCount(cfg: MySqlConfig, table: String): Try[Long] = Try {
    val c = DriverManager.getConnection(url(cfg), connectionProps(cfg))
    try {
      val rs = c.createStatement()
        .executeQuery(s"SELECT COUNT(*) FROM ${quoteIdent(table)}")
      rs.next(); rs.getLong(1)
    } finally c.close()
  }

  /** Pick an integral partition column (first integer-typed primary-key
    * column, else any integer column) and its min/max for range reads. */
  def partitionSpec(cfg: MySqlConfig, table: String): Option[(String, Long, Long)] = {
    def integral(c: Connection): Option[String] = {
      val md = c.getMetaData
      val pks = {
        val rs = md.getPrimaryKeys(cfg.database, null, table)
        val b = scala.collection.mutable.ArrayBuffer.empty[String]
        while (rs.next()) b += rs.getString("COLUMN_NAME")
        b.toSeq
      }
      val intCols = {
        val rs = md.getColumns(cfg.database, null, table, null)
        val b = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
        while (rs.next()) b += ((rs.getString("COLUMN_NAME"), rs.getInt("DATA_TYPE")))
        b.filter { case (_, t) =>
          t == java.sql.Types.INTEGER || t == java.sql.Types.BIGINT ||
            t == java.sql.Types.SMALLINT || t == java.sql.Types.TINYINT
        }.map(_._1).toSeq
      }
      pks.find(intCols.contains).orElse(intCols.headOption)
    }
    Try {
      val c = DriverManager.getConnection(url(cfg), connectionProps(cfg))
      try integral(c).flatMap { colName =>
        val rs = c.createStatement().executeQuery(
          s"SELECT MIN(${quoteIdent(colName)}), MAX(${quoteIdent(colName)}) FROM ${quoteIdent(table)}")
        if (rs.next()) Some((colName, rs.getLong(1), rs.getLong(2))) else None
      } finally c.close()
    } match {
      case Success(v) => v
      case Failure(_) => None
    }
  }

  /** Partitioned table read. With an integral key: numPartitions parallel
    * range scans. Without: one streaming partition (fetchsize-bounded). */
  def read(spark: SparkSession, cfg: MySqlConfig, table: String): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url(cfg))
      .option("dbtable", quoteIdent(table))
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("fetchsize", cfg.chunkSize)
    val withParts = partitionSpec(cfg, table) match {
      case Some((colName, lo, hi)) if hi > lo =>
        base.option("partitionColumn", colName)
          .option("lowerBound", lo)
          .option("upperBound", hi + 1)
          .option("numPartitions", cfg.numPartitions)
      case _ => base
    }
    applyDeclaredTypeMapping(withParts.load())
  }

  /** Enforce the declared MySQL→ORC mapping (README.md:252-259): every
    * integral column widens to LONG. DECIMAL/DATE/TIMESTAMP already arrive
    * exact via JDBC. Pure column casts — stays inside whole-stage codegen. */
  def applyDeclaredTypeMapping(df: DataFrame): DataFrame = {
    val casts = df.schema.fields.map { f =>
      f.dataType match {
        case IntegerType | ShortType | ByteType => col(f.name).cast(LongType).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(casts.toIndexedSeq: _*)
  }
}
