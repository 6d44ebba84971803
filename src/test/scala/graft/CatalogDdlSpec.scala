package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.sinks.{CatalogDdl, OrcSink}

/** End-to-end spec for the external-catalog DDL emitter (reference
  * README.md:191-218: converted ORC dirs mounted as Presto/Spark
  * external tables). The Spark dialect is executed for real — the
  * emitted DDL must mount the converted directory and serve the same
  * rows back through SQL. */
class CatalogDdlSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private def outDir(): String = {
    val d = Files.createTempDirectory("ddlout").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private val rows = Seq(
    (1L, "alpha", 1.5, true), (2L, "beta", 2.5, false), (3L, "gamma", 3.5, true))

  test("spark-dialect DDL mounts the converted dir end-to-end") {
    val out = outDir()
    val df = rows.toDF("id", "name", "score", "flag")
    OrcSink.write(df, out, "events_conv")
    val ddls = CatalogDdl.forOutputDir(spark, out, "spark")
    assert(ddls.map(_._1) === Seq("events_conv"))
    spark.sql("DROP TABLE IF EXISTS events_conv")
    spark.sql(ddls.head._2) // the e2e step: run the emitted DDL verbatim
    val back = spark.sql(
      "SELECT id, name, score, flag FROM events_conv ORDER BY id")
    assert(back.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2), r.getBoolean(3))).toSeq
      === rows)
    // external semantics: dropping the mount must not touch the data
    spark.sql("DROP TABLE events_conv")
    assert(spark.read.orc(s"$out/events_conv").count() === 3)
  }

  test("one DDL per table dir; non-table dirs skipped") {
    val out = outDir()
    OrcSink.write(rows.toDF("id", "name", "score", "flag"), out, "t1")
    OrcSink.write(rows.toDF("id", "name", "score", "flag"), out, "t2")
    new java.io.File(s"$out/not_a_table").mkdirs() // no part files
    assert(CatalogDdl.forOutputDir(spark, out, "hive").map(_._1)
      === Seq("t1", "t2"))
  }

  test("hive and trino dialects carry the full type map") {
    val df = Seq((1L, "a", 2.5f, java.sql.Date.valueOf("2024-01-02"),
        BigDecimal("12.3400"), Array[Byte](1, 2), Seq(1, 2), Map("k" -> 1L)))
      .toDF("id", "s", "r", "d", "dec", "bin", "arr", "m")
      .withColumn("st", struct(col("id").as("a"), col("s").as("b")))
    val hive = CatalogDdl.ddl("t", df.schema, "/data/t", "hive")
    assert(hive.startsWith("CREATE EXTERNAL TABLE IF NOT EXISTS `t`"))
    assert(hive.contains("STORED AS ORC"))
    assert(hive.contains("`id` BIGINT") && hive.contains("`s` STRING"))
    assert(hive.contains("`r` FLOAT") && hive.contains("`d` DATE"))
    assert(hive.contains("`dec` DECIMAL(38,18)") ||
      hive.contains("`dec` DECIMAL(12,4)"))
    assert(hive.contains("`bin` BINARY"))
    assert(hive.contains("`arr` ARRAY<INT>"))
    assert(hive.contains("`m` MAP<STRING,BIGINT>"))
    assert(hive.contains("`st` STRUCT<`a`:BIGINT,`b`:STRING>"))
    assert(hive.contains("LOCATION '/data/t'"))
    val trino = CatalogDdl.ddl("t", df.schema, "/data/t", "trino")
    assert(trino.contains("\"s\" VARCHAR") && trino.contains("\"r\" REAL"))
    assert(trino.contains("\"bin\" VARBINARY"))
    assert(trino.contains("\"arr\" ARRAY(INTEGER)"))
    assert(trino.contains("\"m\" MAP(VARCHAR,BIGINT)"))
    assert(trino.contains("\"st\" ROW(\"a\" BIGINT,\"b\" VARCHAR)"))
    assert(trino.contains("external_location = '/data/t'"))
    assert(trino.contains("format = 'ORC'"))
  }

  test("cli ddl leg prints runnable statements for a converted output dir") {
    val out = outDir()
    OrcSink.write(rows.toDF("id", "name", "score", "flag"), out, "docs")
    val rep = Cli.run(spark, Seq("ddl", out, "trino")).get
    assert(rep.successes === 1 && rep.results.head.table === "docs")
    // empty dir is a usage-shaped failure, not a silent 0/0 success
    assert(Cli.run(spark, Seq("ddl", outDir(), "spark")).isEmpty)
  }

  test("partitioned layout: spark DDL + MSCK mounts per-partition counts") {
    val out = outDir()
    // the conv_cdc_partitioned layout: hive-style key=value dirs
    Seq((1L, "a", "click"), (2L, "b", "click"), (3L, "c", "view"))
      .toDF("id", "payload", "event_type")
      .write.partitionBy("event_type").orc(s"$out/cdc")
    assert(CatalogDdl.detectPartitionCols(spark, s"$out/cdc")
      === Seq("event_type"))
    val ddl = CatalogDdl.forTableDir(spark, s"$out/cdc", "cdc_part", "spark")
    assert(ddl.contains("PARTITIONED BY (`event_type`)"))
    spark.sql("DROP TABLE IF EXISTS cdc_part")
    spark.sql(ddl)
    // before the repair the catalog knows zero partitions
    spark.sql(CatalogDdl.repairStatement("cdc_part", "spark",
      partitioned = true).get)
    val counts = spark.sql(
      "SELECT event_type, count(*) AS n FROM cdc_part GROUP BY 1 ORDER BY 1")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(counts === Seq(("click", 2L), ("view", 1L)))
    // partition pruning must reach the scan: one partition's rows only
    assert(spark.sql(
      "SELECT count(*) FROM cdc_part WHERE event_type = 'view'")
      .head().getLong(0) === 1L)
    spark.sql("DROP TABLE cdc_part")
  }

  test("partitioned layout: hive excludes / trino trails partition cols") {
    val out = outDir()
    Seq((1L, "x", "p1", 7), (2L, "y", "p2", 8))
      .toDF("id", "s", "pk", "bucket")
      .write.partitionBy("pk", "bucket").orc(s"$out/t")
    assert(CatalogDdl.detectPartitionCols(spark, s"$out/t")
      === Seq("pk", "bucket"))
    val hive = CatalogDdl.forTableDir(spark, s"$out/t", "t", "hive")
    // hive: partition cols typed in PARTITIONED BY, NOT in the col list
    assert(hive.contains("PARTITIONED BY (`pk` STRING, `bucket` INT)"))
    assert(!hive.split("PARTITIONED BY")(0).contains("`pk`"))
    val trino = CatalogDdl.forTableDir(spark, s"$out/t", "t", "trino")
    // trino: partition cols LAST in the list + partitioned_by array
    assert(trino.contains("partitioned_by = ARRAY['pk', 'bucket']"))
    val body = trino.substring(trino.indexOf("(") + 1, trino.indexOf(") WITH"))
    val cols = body.split(",\n").map(_.trim.split(" ")(0).replace("\"", ""))
    assert(cols.takeRight(2).toSeq === Seq("pk", "bucket"))
    assert(CatalogDdl.repairStatement("t", "trino", partitioned = true).get
      .contains("sync_partition_metadata"))
    assert(CatalogDdl.repairStatement("t", "spark", partitioned = false)
      .isEmpty)
    // forOutputDir picks up partitioned table dirs (no direct part files)
    assert(CatalogDdl.forOutputDir(spark, out, "hive").map(_._1) === Seq("t"))
  }

  test("schema merged across evolved part files (not one sampled footer)") {
    val out = outDir()
    Seq((1L, "a")).toDF("id", "name")
      .write.mode("append").orc(s"$out/ev")
    Seq((2L, "b", 9.5)).toDF("id", "name", "score")
      .write.mode("append").orc(s"$out/ev")
    val ddl = CatalogDdl.forTableDir(spark, s"$out/ev", "ev", "spark")
    assert(ddl.contains("`score` DOUBLE")) // present in only one footer
  }

  test("unknown dialect and unmappable types fail loudly; quotes escaped") {
    intercept[IllegalArgumentException] {
      CatalogDdl.ddl("t", rows.toDF("a", "b", "c", "d").schema, "/x", "bigquery")
    }
    val ddl = CatalogDdl.ddl("t", Seq((1, "x")).toDF("a", "b").schema,
      "/pa'th", "spark")
    assert(ddl.contains("'/pa''th'"))
  }
}
