package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sinks.SqlDumpSink
import graft.sources.SqlDumpSource

/** SqlDumpSink (distributed dump EXPORT) round-trips value-exactly
  * through SqlDumpSource's statement scanner: hostile strings (quotes,
  * backslashes, newlines, the ");\n" delimiter lookalike), NULLs in
  * every type, booleans, dates, microsecond timestamps, binary-as-hex,
  * decimals — across multiple part files and INSERT batches. */
class SqlDumpSinkSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("s", StringType),
    StructField("flag", BooleanType),
    StructField("dt", DateType),
    StructField("ts", TimestampType),
    StructField("bin", BinaryType),
    StructField("dec", DecimalType(12, 2)),
    StructField("dbl", DoubleType)))

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def dt(s: String) = java.sql.Date.valueOf(s)
  private def bd(s: String) = new java.math.BigDecimal(s)

  private val rows = Seq(
    Row(1L, "plain", true, dt("2024-01-02"), ts("2024-01-02 03:04:05.123456"),
      Array[Byte](1, 2, -3), bd("1234567890.12"), 1.5),
    // quote, backslash, doubled-quote lookalike
    Row(2L, raw"it's a \ backslash '' pair", false, dt("1999-12-31"),
      ts("1999-12-31 23:59:59.0"), Array[Byte](0), bd("-0.01"), -2.75e10),
    // embedded newline + CR + the statement-delimiter lookalike ");\n"
    Row(3L, "line1\nline2\rtail);\nnot a new stmt", true, dt("2000-02-29"),
      ts("2000-02-29 00:00:00.0"), Array[Byte](127, -128), bd("0.00"), 0.0),
    // NULL in every nullable slot
    Row(4L, null, null, null, null, null, null, null),
    // empty string stays a string, not NULL
    Row(5L, "", false, dt("2024-06-01"), ts("2024-06-01 12:00:00.0"),
      Array.empty[Byte], bd("99.99"), 1.0e-7))

  test("value-exact round-trip across parts and INSERT batches") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), schema)
    val out = Files.createTempDirectory("dumpsink").toString
    val (n, files) = SqlDumpSink.write(df, out, "t", rowsPerInsert = 2)
    assert(n == 5)
    assert(files >= 3, s"expected schema part + >=2 data parts, got $files")
    val back = SqlDumpSource.parse(spark, s"$out/t", Seq("all"),
      distributed = true)("t")
    // empty binary exports as 0x with no digits -> parser needs >=1 digit;
    // compare binary via hex string for set equality
    import org.apache.spark.sql.functions.{col, hex}
    def key(d: org.apache.spark.sql.DataFrame) =
      d.select(col("id"), col("s"), col("flag"), col("dt").cast("string"),
        col("ts").cast("string"), hex(col("bin")).as("binhex"),
        col("dec").cast("string"), col("dbl"))
        .collect().map(_.toSeq).toSet
    assert(key(back) == key(df))
  }

  test("Cli export sql produces a re-parsable dump directory") {
    val sf = "/root/testdata/sf0.001"
    val base = Files.createTempDirectory("cliexp").toString
    graft.sinks.OrcSink.write(Tables.t(spark, sf, "region"), base, "region")
    val rep = Cli.run(spark,
      Seq("export", s"$base/region", s"$base/out", "sql")).get
    assert(rep.successes == 1 && rep.results.head.rows == 5)
    val back = SqlDumpSource.parse(spark, s"$base/out/region",
      Seq("all"), distributed = true)("region")
    assert(back.count() == 5)
    assert(back.columns.toSeq ==
      Tables.t(spark, sf, "region").columns.toSeq)
  }
}
