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
  *    quoted; credentials travel in connection Properties, not
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
  * The core is engine-generic (`JdbcConn`): the production path is MySQL
  * (`MySqlConfig`), and the runtime contract — catalog listing, row count,
  * range-partitioned read, type mapping — is exercised end-to-end against
  * embedded Apache Derby (the JDBC database shipped with Spark's jars),
  * since no MySQL server exists in this build environment.
  */
object JdbcSource {

  /** Engine-generic connection descriptor. `catalog`/`schemaPattern` feed
    * `DatabaseMetaData` lookups: MySQL maps databases to JDBC catalogs;
    * Derby (and most others) use schemas. */
  final case class JdbcConn(
      url: String,
      user: String = "",
      password: String = "",
      catalog: Option[String] = None,
      schemaPattern: Option[String] = None,
      quoteChar: Char = '`',
      chunkSize: Int = 50000, // reference default, sh:192
      numPartitions: Int = 8,
      // TIMESTAMP is tz-less on the wire; true restores TimestampNTZType
      // on read-back (Spark 4 parquet-inferred NTZ fixtures stay
      // type-stable through a load/read round trip).
      preferTimestampNTZ: Boolean = false)

  final case class MySqlConfig(
      host: String,
      port: Int = 3306,
      user: String,
      password: String,
      database: String,
      chunkSize: Int = 50000,
      numPartitions: Int = 8) {
    def conn: JdbcConn = JdbcConn(
      url = JdbcSource.url(this), user = user, password = password,
      catalog = Some(database), schemaPattern = None, quoteChar = '`',
      chunkSize = chunkSize, numPartitions = numPartitions)
  }

  def url(cfg: MySqlConfig): String =
    s"jdbc:mysql://${cfg.host}:${cfg.port}/${cfg.database}" +
      "?useUnicode=true&characterEncoding=utf8mb4&zeroDateTimeBehavior=convertToNull"

  /** Embedded Derby database at `dbDir` (created on first connect). Derby
    * folds unquoted identifiers to upper case, so all identifiers go
    * through `"`-quoting to stay case-exact. */
  def derby(dbDir: String, create: Boolean = true): JdbcConn = {
    // keep derby.log out of the working directory
    if (System.getProperty("derby.stream.error.file") == null)
      System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    // Derby ≥10.15 splits the driver across derby/derbytools jars; force
    // registration in case JDBC4 ServiceLoader autoload did not fire.
    Try(Class.forName("org.apache.derby.jdbc.EmbeddedDriver"))
    JdbcConn(
      url = s"jdbc:derby:$dbDir${if (create) ";create=true" else ""}",
      schemaPattern = Some("APP"), quoteChar = '"')
  }

  def connectionProps(conn: JdbcConn): Properties = {
    val p = new Properties()
    if (conn.user.nonEmpty) p.setProperty("user", conn.user)
    if (conn.password.nonEmpty) p.setProperty("password", conn.password)
    p.setProperty("fetchsize", conn.chunkSize.toString)
    p
  }
  def connectionProps(cfg: MySqlConfig): Properties = connectionProps(cfg.conn)

  /** Quote an identifier (defence for sh:216/236's f-strings). */
  def quoteIdent(conn: JdbcConn, name: String): String = {
    val q = conn.quoteChar
    s"$q${name.replace(q.toString, s"$q$q")}$q"
  }
  def quoteIdent(name: String): String = "`" + name.replace("`", "``") + "`"

  private def withConnection[A](conn: JdbcConn)(f: Connection => A): A = {
    val c = DriverManager.getConnection(conn.url, connectionProps(conn))
    try f(c) finally c.close()
  }

  /** Connection probe (reference `test_mysql_connection`, sh:583-589). */
  def testConnection(conn: JdbcConn): Try[Unit] =
    Try(withConnection(conn) { c => c.isValid(5); () })
  def testConnection(cfg: MySqlConfig): Try[Unit] = testConnection(cfg.conn)

  /** Catalog listing (reference `SHOW TABLES`, sh:570-580): base tables
    * only, sorted. `DatabaseMetaData.getTables` is the portable equivalent
    * of the reference's information_schema query. */
  def tableList(conn: JdbcConn): Try[Seq[String]] = Try {
    withConnection(conn) { c =>
      val rs = c.getMetaData.getTables(
        conn.catalog.orNull, conn.schemaPattern.orNull, null, Array("TABLE"))
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      while (rs.next()) out += rs.getString("TABLE_NAME")
      out.sorted.toSeq
    }
  }
  def tableList(cfg: MySqlConfig): Try[Seq[String]] = tableList(cfg.conn)

  /** Row count (reference `get_table_row_count`, sh:214-219), pushed down. */
  def rowCount(conn: JdbcConn, table: String): Try[Long] = Try {
    withConnection(conn) { c =>
      val rs = c.createStatement()
        .executeQuery(s"SELECT COUNT(*) FROM ${quoteIdent(conn, table)}")
      rs.next(); rs.getLong(1)
    }
  }
  def rowCount(cfg: MySqlConfig, table: String): Try[Long] = rowCount(cfg.conn, table)

  /** Pick an integral partition column (first integer-typed primary-key
    * column, else any integer column) and its min/max for range reads. */
  def partitionSpec(conn: JdbcConn, table: String): Option[(String, Long, Long)] = {
    def integral(c: Connection): Option[String] = {
      val md = c.getMetaData
      val pks = {
        val rs = md.getPrimaryKeys(conn.catalog.orNull, conn.schemaPattern.orNull, table)
        val b = scala.collection.mutable.ArrayBuffer.empty[String]
        while (rs.next()) b += rs.getString("COLUMN_NAME")
        b.toSeq
      }
      val intCols = {
        val rs = md.getColumns(conn.catalog.orNull, conn.schemaPattern.orNull, table, null)
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
      withConnection(conn) { c =>
        integral(c).flatMap { colName =>
          val rs = c.createStatement().executeQuery(
            s"SELECT MIN(${quoteIdent(conn, colName)}), MAX(${quoteIdent(conn, colName)}) " +
              s"FROM ${quoteIdent(conn, table)}")
          if (rs.next()) Some((colName, rs.getLong(1), rs.getLong(2))) else None
        }
      }
    } match {
      case Success(v) => v
      case Failure(_) => None
    }
  }
  def partitionSpec(cfg: MySqlConfig, table: String): Option[(String, Long, Long)] =
    partitionSpec(cfg.conn, table)

  /** Partitioned table read. With an integral key: numPartitions parallel
    * range scans. Without: one streaming partition (fetchsize-bounded). */
  def read(spark: SparkSession, conn: JdbcConn, table: String): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", conn.url)
      .option("dbtable", quoteIdent(conn, table))
      .option("fetchsize", conn.chunkSize)
      .option("preferTimestampNTZ", conn.preferTimestampNTZ)
    val withAuth =
      if (conn.user.nonEmpty) base.option("user", conn.user).option("password", conn.password)
      else base
    val withParts = partitionSpec(conn, table) match {
      case Some((colName, lo, hi)) if hi > lo =>
        // raw name: Spark resolves it against the schema and quotes it
        // through the engine's JdbcDialect itself
        withAuth.option("partitionColumn", colName)
          .option("lowerBound", lo)
          .option("upperBound", hi + 1)
          .option("numPartitions", conn.numPartitions)
      case _ => withAuth
    }
    applyDeclaredTypeMapping(withParts.load())
  }
  def read(spark: SparkSession, cfg: MySqlConfig, table: String): DataFrame =
    read(spark, cfg.conn, table)

  /** Distributed JDBC write-back — the reverse converter leg (table ->
    * database), Spark-native bulk load: each partition opens one
    * connection and streams batched INSERTs (`batchsize` = chunkSize),
    * so a many-partition frame loads over parallel connections with no
    * driver bottleneck. `overwrite` drops and recreates the table
    * through the engine's JdbcDialect DDL; pass pre-quoted identifiers
    * via [[quoteIdent]] for case-exact names on fold-to-upper engines
    * (Derby). */
  def write(df: DataFrame, conn: JdbcConn, table: String,
            mode: String = "overwrite"): Unit =
    df.write.mode(mode)
      .option("batchsize", conn.chunkSize)
      .jdbc(conn.url, quoteIdent(conn, table), connectionProps(conn))

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
