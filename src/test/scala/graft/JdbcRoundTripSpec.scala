package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.types._

import graft.sinks.OrcSink
import graft.sources.{JdbcFixture, JdbcSource}
import graft.ConversionJob.JobConfig

/** Live-JDBC runtime coverage for reference S1-S4 (connection probe,
  * catalog listing, pushed-down row count, range-partitioned chunked read)
  * plus the declared type mapping (reference README.md:252-259), against
  * embedded Apache Derby — the JDBC database shipped with Spark's jars.
  * The MySQL config drives the exact same engine-generic code path; only
  * the URL/quote-char/metadata-scope differ. */
class JdbcRoundTripSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val sf = "/root/testdata/sf0.001"

  private def freshConn() = {
    val dir = Files.createTempDirectory("derby").toString
    JdbcSource.derby(s"$dir/db")
  }

  test("connection probe succeeds against a live database (S4)") {
    assert(JdbcSource.testConnection(freshConn()).isSuccess)
    val dead = JdbcSource.derby("/tmp/nonexistent-derby-db", create = false)
    assert(JdbcSource.testConnection(dead).isFailure)
  }

  test("catalog listing returns base tables sorted (S3)") {
    val conn = freshConn()
    JdbcFixture.loadTable(Tables.t(spark, sf, "region"), conn, "region")
    JdbcFixture.loadTable(Tables.t(spark, sf, "nation"), conn, "nation")
    assert(JdbcSource.tableList(conn).get == Seq("nation", "region"))
  }

  test("fixture loader round-trips NULL cells (typed setNull, Derby 22005)") {
    import org.apache.spark.sql.Row
    val conn = freshConn()
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType),
      StructField("d", DoubleType), StructField("ts", TimestampType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, null, 2.5, null),
        Row(2L, "x", null, java.sql.Timestamp.valueOf("2024-01-02 03:04:05")))),
      schema)
    JdbcFixture.loadTable(df, conn, "nullable_t")
    val back = JdbcSource.read(spark, conn, "nullable_t").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(back == Set((1L, None, Some(2.5)), (2L, Some("x"), None)))
  }

  test("TimestampNTZ columns load and round-trip (orders.o_orderdate shape)") {
    import org.apache.spark.sql.Row
    // Spark 4 infers NTZ from parquet with isAdjustedToUTC=false — the
    // orders fixture arrives exactly like this, so the fixture loader must
    // accept NTZ (round-11 red: conv_jdbc_incremental threw "no JDBC
    // fixture mapping for TimestampNTZType").
    val conn = freshConn()
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("ts", TimestampNTZType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, java.time.LocalDateTime.parse("1994-06-01T12:30:45")),
        Row(2L, null))),
      schema)
    JdbcFixture.loadTable(df, conn, "ntz_t")
    // default read: tz-less wire value surfaces as an instant (wall clock
    // preserved in the session zone)
    val asTs = JdbcSource.read(spark, conn, "ntz_t")
    assert(asTs.schema("ts").dataType == TimestampType)
    assert(asTs.collect().map(r => Option(r.get(1))).count(_.isDefined) == 1)
    // preferTimestampNTZ read: the round trip is type-stable
    val back = JdbcSource.read(spark, conn.copy(preferTimestampNTZ = true), "ntz_t")
    assert(back.schema("ts").dataType == TimestampNTZType)
    val got = back.collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(got(1L).contains(java.time.LocalDateTime.parse("1994-06-01T12:30:45")))
    assert(got(2L).isEmpty)
  }

  test("row count is pushed down (S2)") {
    val conn = freshConn()
    JdbcFixture.loadTable(Tables.t(spark, sf, "nation"), conn, "nation")
    assert(JdbcSource.rowCount(conn, "nation").get == 25L)
  }

  test("declared type mapping holds against real JDBC metadata (README.md:252-259)") {
    val conn = freshConn()
    val c = java.sql.DriverManager.getConnection(conn.url)
    c.createStatement().executeUpdate(
      """CREATE TABLE "typed" ("i" INTEGER, "s" SMALLINT, "b" BIGINT,
        | "dec" DECIMAL(12,2), "d" DATE, "ts" TIMESTAMP, "v" VARCHAR(32))""".stripMargin)
    val st = c.prepareStatement("INSERT INTO \"typed\" VALUES (?,?,?,?,?,?,?)")
    st.setInt(1, 7); st.setShort(2, 3); st.setLong(3, 1234567890123L)
    st.setBigDecimal(4, new java.math.BigDecimal("99999999.99"))
    st.setDate(5, java.sql.Date.valueOf("1995-03-15"))
    // micros must survive: DATETIME -> TIMESTAMP with sub-second precision
    st.setTimestamp(6, java.sql.Timestamp.valueOf("1995-03-15 10:30:45.123456"))
    st.setString(7, "hello")
    st.executeUpdate(); c.close()

    val df = JdbcSource.read(spark, conn, "typed")
    val s = df.schema
    assert(s("i").dataType == LongType)   // INT -> LONG
    assert(s("s").dataType == LongType)   // SMALLINT -> LONG
    assert(s("b").dataType == LongType)
    assert(s("dec").dataType == DecimalType(12, 2)) // precision preserved
    assert(s("d").dataType == DateType)
    assert(s("ts").dataType == TimestampType)
    val r = df.collect()(0)
    assert(r.getAs[Long]("i") == 7L)
    assert(r.getAs[Long]("s") == 3L)
    assert(r.getAs[java.math.BigDecimal]("dec") == new java.math.BigDecimal("99999999.99"))
    assert(r.getAs[java.sql.Timestamp]("ts") ==
      java.sql.Timestamp.valueOf("1995-03-15 10:30:45.123456"))
  }

  test("integral-PK table reads range-partitioned, not single-stream (S1)") {
    val conn = freshConn()
    JdbcFixture.loadTable(Tables.t(spark, sf, "supplier"), conn, "supplier",
      primaryKey = Some("s_suppkey"))
    assert(JdbcSource.partitionSpec(conn, "supplier").map(_._1).contains("s_suppkey"))
    val df = JdbcSource.read(spark, conn, "supplier")
    assert(df.rdd.getNumPartitions == conn.numPartitions,
      "range spec must fan the scan out into numPartitions parallel ranges")
    val want = Tables.t(spark, sf, "supplier").collect()
      .map(r => (r.getAs[Long]("s_suppkey"), r.getAs[String]("s_name"))).toSet
    val got = df.collect().map(r => (r.getAs[Long]("s_suppkey"), r.getAs[String]("s_name"))).toSet
    assert(got == want)
    // no integral column -> still readable, single partition
    JdbcFixture.loadTable(
      Tables.t(spark, sf, "region").selectExpr("r_name"), conn, "strs")
    assert(JdbcSource.read(spark, conn, "strs").count() == 5)
  }

  test("ConversionJob drives live-JDBC tables to ORC (Cli mysql shape)") {
    val conn = freshConn()
    val out = Files.createTempDirectory("jdbcjob").toString
    JdbcFixture.loadTable(Tables.t(spark, sf, "region"), conn, "region")
    JdbcFixture.loadTable(Tables.t(spark, sf, "nation"), conn, "nation")
    // same shape as Cli.run's mysql branch: catalog listing -> read thunks
    val names = JdbcSource.tableList(conn).get
    val report = ConversionJob.run(
      names.map(t => t -> (() => JdbcSource.read(spark, conn, t))),
      JobConfig(outputDir = out, compression = "snappy"))
    assert(report.total == 2 && report.successes == 2)
    assert(OrcSink.read(spark, s"$out/region").count() == 5)
    assert(OrcSink.read(spark, s"$out/nation").count() == 25)
  }
}
