package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.CsvSource

/** Malformed-CSV policies: PERMISSIVE quarantine with the corrupt
  * column, DROPMALFORMED, FAILFAST, and the guard that corrupt-column
  * accounting requires an explicit schema. */
class CsvBadRecordsSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", DoubleType)))

  private def stage(): String = {
    val f = Files.createTempFile("dirty", ".csv")
    Files.write(f, "k,v\n1,1.5\noops,2.5\n3,not-a-number\n4,4.5\n"
      .getBytes(StandardCharsets.UTF_8))
    f.toString
  }

  test("PERMISSIVE + corrupt column quarantines with raw text") {
    val df = CsvSource.read(spark, stage(), CsvSource.CsvOptions(
      inferSchema = false, schema = Some(schema), corruptColumn = Some("_bad")))
    val rows = df.orderBy(col("k").asc_nulls_last).collect()
    assert(rows.length === 4)
    val bad = rows.filter(!_.isNullAt(2))
    assert(bad.map(_.getString(2)).toSet === Set("oops,2.5", "3,not-a-number"))
    // good rows parse fully
    assert(rows.filter(_.isNullAt(2)).map(_.getLong(0)).toSet === Set(1L, 4L))
  }

  test("DROPMALFORMED silently keeps only parseable rows") {
    val df = CsvSource.read(spark, stage(), CsvSource.CsvOptions(
      inferSchema = false, schema = Some(schema), mode = "DROPMALFORMED"))
    // note: a bare count() would report 4 — Spark's CSV count pushdown
    // skips parsing entirely, so malformed rows only drop on queries
    // that materialize columns (documented Spark caveat, pinned here)
    assert(df.count() === 4L)
    assert(df.collect().length === 2)
  }

  test("FAILFAST throws on the first malformed row") {
    val df = CsvSource.read(spark, stage(), CsvSource.CsvOptions(
      inferSchema = false, schema = Some(schema), mode = "FAILFAST"))
    intercept[org.apache.spark.SparkException] { df.collect() }
  }

  test("corrupt column without a schema is rejected loudly") {
    intercept[IllegalArgumentException] {
      CsvSource.read(spark, stage(), CsvSource.CsvOptions(
        corruptColumn = Some("_bad")))
    }
    intercept[IllegalArgumentException] {
      CsvSource.read(spark, stage(), CsvSource.CsvOptions(mode = "BOGUS"))
    }
  }

  test("multiLine reassembles quoted embedded newlines; default mode shreds them") {
    val f = Files.createTempFile("ml", ".csv")
    Files.write(f, "k,v\n1,\"a\nb \"\"q\"\" c\"\n2,plain\n"
      .getBytes(StandardCharsets.UTF_8))
    val sc = StructType(Seq(StructField("k", LongType), StructField("v", StringType)))
    val ml = CsvSource.read(spark, f.toString, CsvSource.CsvOptions(
      inferSchema = false, schema = Some(sc), multiLine = true, escape = "\""))
      .orderBy("k").collect()
    assert(ml.length === 2)
    assert(ml(0).getString(1) === "a\nb \"q\" c")
    // line-based default cannot reassemble the record
    val plain = CsvSource.read(spark, f.toString, CsvSource.CsvOptions(
      inferSchema = false, schema = Some(sc)))
      .collect()
    assert(plain.length !== 2)
  }
}
