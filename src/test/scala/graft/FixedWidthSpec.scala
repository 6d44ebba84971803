package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.FixedWidthSource
import graft.sources.FixedWidthSource.ColSpec

/** FixedWidthSource: positional slicing/typing round-trip, blank-field
  * semantics, overflow refusal, spec parsing with typed parens. */
class FixedWidthSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  test("spec parser handles parenthesized types") {
    val specs = FixedWidthSource.parseSpecs(
      "id:10:bigint,amt:14:decimal(12,2),name:20:string")
    assert(specs == Seq(ColSpec("id", 10, "bigint"),
      ColSpec("amt", 14, "decimal(12,2)"), ColSpec("name", 20, "string")))
    intercept[IllegalArgumentException] {
      FixedWidthSource.parseSpecs("id:bigint")
    }
  }

  test("write -> read round-trips values; blanks read as NULL (empty for strings)") {
    val specs = Seq(ColSpec("id", 6, "bigint"), ColSpec("s", 10, "string"),
      ColSpec("amt", 12, "decimal(10,2)"))
    val df = Seq(
      (1L, "alpha", "12.50"),
      (2L, "", null.asInstanceOf[String]),
      (3L, "pad  end", "-0.01")) // interior spaces survive; edges trim
      .toDF("id", "s", "amt")
      .selectExpr("id", "s", "cast(amt as decimal(10,2)) as amt")
    val dir = Files.createTempDirectory("fw").toString + "/t"
    FixedWidthSource.write(df, dir, specs)
    val back = FixedWidthSource.read(spark, dir, specs)
    val rows = back.orderBy("id").collect()
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "alpha" &&
      rows(0).getDecimal(2).toPlainString == "12.50")
    // blank string field reads as "" (format-inherent: no NULL marker);
    // blank numeric reads as NULL
    assert(rows(1).getString(1) == "" && rows(1).isNullAt(2))
    assert(rows(2).getString(1) == "pad  end" &&
      rows(2).getDecimal(2).toPlainString == "-0.01")
  }

  test("write refuses a value wider than its column") {
    val specs = Seq(ColSpec("s", 4, "string"))
    val dir = Files.createTempDirectory("fw_over").toString + "/t"
    val e = intercept[Exception] {
      FixedWidthSource.write(Seq("too wide").toDF("s"), dir, specs)
    }
    assert(e.getMessage != null)
  }

  test("Cli fixedwidth converts a staged directory as one table") {
    val sf = "/root/testdata/sf0.001"
    val base = Files.createTempDirectory("fw_cli").toString
    val spec = "r_regionkey:6:bigint,r_name:16:string"
    val df = Tables.t(spark, sf, "region")
      .selectExpr("r_regionkey", "r_name")
    FixedWidthSource.write(df, s"$base/in/region.txt",
      FixedWidthSource.parseSpecs(spec))
    val rep = Cli.run(spark,
      Seq("fixedwidth", s"$base/in/region.txt", s"$base/out", spec)).get
    assert(rep.successes == 1)
    val back = graft.sinks.OrcSink.read(spark, s"$base/out/region")
    assert(back.count() == 5)
    assert(back.columns.toSeq == Seq("r_regionkey", "r_name"))
  }
}
