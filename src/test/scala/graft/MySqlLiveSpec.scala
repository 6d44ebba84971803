package graft

import scala.util.Try

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.sources.JdbcSource

/** LIVE MySQL integration spec — the documented residual of the S1-S4
  * coverage (every other path is proven against embedded Derby plus the
  * recorded Connector/J metadata in MySqlDialectSpec, because no MySQL
  * server can exist in the build sandbox). This spec AUTO-ACTIVATES when
  * a real server is reachable and cancels cleanly otherwise, so it costs
  * nothing in the sandbox and closes the residual the first time CI runs
  * beside a MySQL service:
  *
  * {{{
  *   GRAFT_MYSQL_HOST=127.0.0.1 \
  *   GRAFT_MYSQL_USER=root GRAFT_MYSQL_PASSWORD=... \
  *   GRAFT_MYSQL_DATABASE=graft_it \
  *   sbt "testOnly graft.MySqlLiveSpec"   // + Connector/J on the classpath
  * }}}
  *
  * Every test `assume`s the gate: absent host env OR absent
  * com.mysql.cj.jdbc.Driver -> the suite reports CANCELED, never failed.
  * When live it re-proves, on the real wire: the connection probe (S4),
  * catalog listing (S3), pushed-down COUNT (S2), the range-partitioned
  * chunked read against a loaded fixture (S1), and — the part Derby
  * cannot stand in for — that the RECORDED Connector/J metadata matrix
  * (MySqlDialectSpec) matches what a live server actually returns for
  * the MySQL-only column kinds (ENUM/SET/BIT/JSON/GEOMETRY/TIME/YEAR). */
class MySqlLiveSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private lazy val live: Option[JdbcSource.MySqlConfig] =
    sys.env.get("GRAFT_MYSQL_HOST")
      .filter(_ => Try(Class.forName("com.mysql.cj.jdbc.Driver")).isSuccess)
      .map { host =>
        JdbcSource.MySqlConfig(
          host = host,
          port = sys.env.getOrElse("GRAFT_MYSQL_PORT", "3306").toInt,
          user = sys.env.getOrElse("GRAFT_MYSQL_USER", "root"),
          password = sys.env.getOrElse("GRAFT_MYSQL_PASSWORD", ""),
          database = sys.env.getOrElse("GRAFT_MYSQL_DATABASE", "graft_it"))
      }

  private def gate(): JdbcSource.MySqlConfig = {
    assume(live.nonEmpty,
      "no live MySQL: set GRAFT_MYSQL_HOST (+_USER/_PASSWORD/_DATABASE) " +
        "and put Connector/J on the classpath")
    live.get
  }

  private def withStatement[A](cfg: JdbcSource.MySqlConfig)(
      f: java.sql.Statement => A): A = {
    val c = java.sql.DriverManager.getConnection(
      JdbcSource.url(cfg), JdbcSource.connectionProps(cfg))
    try { val st = c.createStatement(); try f(st) finally st.close() }
    finally c.close()
  }

  test("S4: connection probe succeeds against the live server") {
    val cfg = gate()
    assert(JdbcSource.testConnection(cfg).isSuccess)
    val dead = cfg.copy(port = 1) // nothing listens on 1
    assert(JdbcSource.testConnection(dead).isFailure)
  }

  test("S1-S3: fixture loads, lists, counts, and chunk-reads back exactly") {
    val cfg = gate()
    val nation = Tables.t(spark, "/root/testdata/sf0.001", "nation")
    withStatement(cfg)(_.execute("DROP TABLE IF EXISTS graft_live_nation"))
    graft.sources.JdbcFixture.loadTable(nation, cfg.conn, "graft_live_nation")
    assert(JdbcSource.tableList(cfg).get.contains("graft_live_nation"))
    assert(JdbcSource.rowCount(cfg, "graft_live_nation").get == nation.count())
    val back = JdbcSource.read(spark, cfg, "graft_live_nation")
    assert(back.rdd.getNumPartitions > 1, "chunked read must partition")
    val a = nation.select(col("n_nationkey"), col("n_name")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val b = back.select(col("n_nationkey"), col("n_name")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b)
  }

  test("recorded Connector/J matrix matches the live wire for MySQL-only types") {
    val cfg = gate()
    withStatement(cfg) { st =>
      st.execute("DROP TABLE IF EXISTS graft_live_types")
      st.execute("""CREATE TABLE graft_live_types (
        e_enum ENUM('red','green','yellow'),
        s_set SET('a','bb','ccc'),
        b_bit1 BIT(1), b_bit8 BIT(8), b_tinyint1 TINYINT(1),
        j_json JSON, g_geometry GEOMETRY, tm_time TIME, y_year YEAR)""")
      st.execute("""INSERT INTO graft_live_types VALUES
        ('red', 'a,ccc', b'1', b'10100101', 1,
         '{"k": 1}', ST_GeomFromText('POINT(1 2)'), '13:14:15', 2024)""")
      val rs = st.executeQuery("SELECT * FROM graft_live_types")
      val md = rs.getMetaData
      val liveMatrix = (1 to md.getColumnCount).map(i =>
        (md.getColumnName(i), md.getColumnType(i), md.getColumnTypeName(i)))
      // the tuples MySqlDialectSpec replays from recordings, live
      val expected = Seq(
        ("e_enum", java.sql.Types.CHAR, "ENUM"),
        ("s_set", java.sql.Types.CHAR, "SET"),
        ("b_bit1", java.sql.Types.BIT, "BIT"),
        ("b_bit8", java.sql.Types.BIT, "BIT"),
        ("b_tinyint1", java.sql.Types.BIT, "TINYINT"),
        ("j_json", java.sql.Types.LONGVARCHAR, "JSON"),
        ("g_geometry", java.sql.Types.BINARY, "GEOMETRY"),
        ("tm_time", java.sql.Types.TIME, "TIME"),
        ("y_year", java.sql.Types.DATE, "YEAR"))
      assert(liveMatrix == expected)
    }
    // and the Spark-side read maps them through the real MySQLDialect
    val df = JdbcSource.read(spark, cfg, "graft_live_types")
    val byName = df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(byName("e_enum") == "string")
    assert(byName("j_json") == "string")
    assert(byName("b_bit1") == "boolean")
    assert(byName("g_geometry") == "binary")
  }
}
