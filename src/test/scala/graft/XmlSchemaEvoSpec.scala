package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.sinks.OrcSink
import graft.sources.XmlSource

/** XML input leg (Spark 4 built-in XML datasource) + schema-evolution
  * read-back — the two round-9 additions to the universal-input matrix. */
class XmlSchemaEvoSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val sf = "/root/testdata/sf0.001"

  test("XML round-trip preserves every row and type (explicit schema)") {
    val df = Tables.t(spark, sf, "part")
    val want = df.collect().toSet
    val dir = Files.createTempDirectory("xml_rt").toString
    XmlSource.write(df, s"$dir/part", rowTag = "part")
    val schema = StructType.fromDDL(
      "p_partkey BIGINT, p_name STRING, p_brand STRING, p_type STRING, " +
        "p_size INT, p_retailprice DOUBLE")
    val back = XmlSource.read(spark, s"$dir/part",
      XmlSource.XmlOptions(rowTag = "part", schema = Some(schema)))
      .select(df.columns.map(col): _*)
    assert(back.collect().toSet == want)
  }

  test("XML entity escaping round-trips special characters") {
    import spark.implicits._
    val rows = Seq(
      (1L, "a < b & c > d"),
      (2L, "quote \" and apos ' and amp &amp; literal"),
      (3L, "tag-like <row> inside text"),
      (4L, "unicode é中文 ok"))
    val df = rows.toDF("id", "s")
    val dir = Files.createTempDirectory("xml_esc").toString
    XmlSource.write(df, s"$dir/t", rowTag = "r")
    val back = XmlSource.read(spark, s"$dir/t",
      XmlSource.XmlOptions(rowTag = "r",
        schema = Some(StructType.fromDDL("id BIGINT, s STRING"))))
    assert(back.select("id", "s").as[(Long, String)].collect().toSet == rows.toSet)
  }

  test("Cli xml subcommand converts per-input to ORC table dirs") {
    val df = Tables.t(spark, sf, "region")
    val inDir = Files.createTempDirectory("xml_cli_in").toString
    XmlSource.write(df.coalesce(1), s"$inDir/staging", rowTag = "row")
    // promote the single part file to a named .xml input (per-input naming
    // contract derives the table name from the file's base name)
    val part = new java.io.File(s"$inDir/staging").listFiles()
      .find(_.getName.endsWith(".xml")).get
    val named = new java.io.File(inDir, "region.xml")
    Files.move(part.toPath, named.toPath)
    val outDir = Files.createTempDirectory("xml_cli_out").toString
    val report = Cli.run(spark, Seq("xml", named.toString, outDir)).get
    assert(report.results.map(r => (r.table, r.success)) == Seq(("region", true)))
    val back = OrcSink.read(spark, s"$outDir/region")
    assert(back.count() == df.count())
    // inferred numeric column must survive as a numeric type, not string
    assert(!back.schema("r_regionkey").dataType.typeName.contains("string"))
  }

  test("schema evolution: unionByName null-fills per-snapshot missing columns") {
    val cust = Tables.t(spark, sf, "customer")
    val dir = Files.createTempDirectory("schemaevo").toString
    OrcSink.write(cust.filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal")),
      dir, "snap_a")
    OrcSink.write(cust.filter(col("c_custkey") % 2 === 1)
      .select(col("c_custkey"), col("c_mktsegment"),
        (col("c_custkey") % 100).cast("double").as("c_score")),
      dir, "snap_b")
    val a = OrcSink.read(spark, s"$dir/snap_a")
    val b = OrcSink.read(spark, s"$dir/snap_b")
    val u = a.unionByName(b, allowMissingColumns = true)
    val n = cust.count()
    assert(u.count() == n)
    val agg = u.agg(
      count(col("c_acctbal")).as("nb"),
      count(col("c_score")).as("ns"),
      sum(col("c_custkey")).as("sk")).head()
    val nEven = cust.filter(col("c_custkey") % 2 === 0).count()
    assert(agg.getLong(0) == nEven)
    assert(agg.getLong(1) == n - nEven)
    assert(agg.getLong(2) == cust.agg(sum(col("c_custkey"))).head().getLong(0))
  }

  test("malformed-XML policies: quarantine, drop, failfast") {
    import spark.implicits._
    val dir = Files.createTempDirectory("xml_bad").toString
    // two good rows, one row whose id fails the BIGINT schema
    val xml =
      """<?xml version="1.0"?>
        |<rows>
        |<r><id>1</id><s>ok-one</s></r>
        |<r><id>not-a-number</id><s>bad</s></r>
        |<r><id>3</id><s>ok-three</s></r>
        |</rows>""".stripMargin
    Files.write(java.nio.file.Paths.get(dir, "t.xml"), xml.getBytes("UTF-8"))
    val schema = StructType.fromDDL("id BIGINT, s STRING")
    // PERMISSIVE + corrupt column: bad row lands with raw markup
    val quarantined = XmlSource.read(spark, s"$dir/t.xml",
      XmlSource.XmlOptions(rowTag = "r", schema = Some(schema),
        corruptColumn = Some("_bad")))
    val rows = quarantined.collect()
    assert(rows.length == 3)
    val bad = rows.filter(r => !r.isNullAt(r.fieldIndex("_bad")))
    assert(bad.length == 1 && bad.head.getString(bad.head.fieldIndex("_bad"))
      .contains("not-a-number"))
    assert(quarantined.filter(col("_bad").isNull).as[(Long, String, String)]
      .collect().map(t => (t._1, t._2)).toSet == Set((1L, "ok-one"), (3L, "ok-three")))
    // DROPMALFORMED drops the cast-failed record on materialization —
    // but the same count-pushdown caveat as CSV applies (pinned): a bare
    // count() parses no columns, so nothing fails and the DROPPED row is
    // still counted. Row-accurate accounting under DROPMALFORMED needs a
    // materializing action (or the PERMISSIVE corrupt-column path).
    val castDrop = XmlSource.read(spark, s"$dir/t.xml",
      XmlSource.XmlOptions(rowTag = "r", schema = Some(schema),
        mode = "DROPMALFORMED"))
    assert(castDrop.count() == 3, "count pushdown sees the undropped raw records")
    assert(castDrop.collect().length == 2, "materialization drops the cast failure")

    // structurally broken markup: drop and failfast behave as documented
    val broken =
      """<?xml version="1.0"?>
        |<rows>
        |<r><id>1</id><s>ok-one</s></r>
        |<r><id>2</id><s>unclosed
        |<r><id>3</id><s>ok-three</s></r>
        |</rows>""".stripMargin
    Files.write(java.nio.file.Paths.get(dir, "broken.xml"), broken.getBytes("UTF-8"))
    val dropped = XmlSource.read(spark, s"$dir/broken.xml",
      XmlSource.XmlOptions(rowTag = "r", schema = Some(schema),
        mode = "DROPMALFORMED"))
    assert(dropped.count() < 3, "structurally malformed record must drop")
    val ff = XmlSource.read(spark, s"$dir/broken.xml",
      XmlSource.XmlOptions(rowTag = "r", schema = Some(schema), mode = "FAILFAST"))
    assertThrows[org.apache.spark.SparkException](ff.collect())
  }

  test("registered gates run and agree with in-Spark oracle replay") {
    for (name <- Seq("conv_xml_roundtrip", "conv_schema_evolution")) {
      val out = SparkEntry.queries(name)(spark, sf)
      assert(out.count() > 0, name)
      assert(SparkEntry.oracleSql.contains(name), name)
    }
    // conv_xml_roundtrip values against a direct-parquet replay of the
    // same aggregate (the DuckDB oracle computes this identically)
    val got = SparkEntry.queries("conv_xml_roundtrip")(spark, sf).collect()
    val want = Tables.t(spark, sf, "part")
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        sum(col("p_partkey")).as("sum_key"),
        sum(col("p_size").cast("long")).as("sum_size"),
        Tables.dsumr(col("p_retailprice")).as("sum_price"))
      .orderBy(col("p_brand")).collect()
    assert(got.toSeq == want.toSeq)
  }
}
