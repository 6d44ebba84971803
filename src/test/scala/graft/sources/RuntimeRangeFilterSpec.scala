package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThan, LessThanOrEqual}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.SparkSessionTestWrapper
import graft.sinks.SnapshotTable

/** Runtime (post-planning) filters beyond IN (VERDICT r15 #6): the
  * scan's SupportsRuntimeFiltering now consumes min/max-provable
  * EqualTo and range shapes through the same conservative box pruning
  * as static filters — a runtime bound drops whole file groups before
  * any data I/O, with the identical NaN guards. This spec drives the
  * scan directly (package-private surface) because Spark's own
  * injectors deliver IN for DPP; the runtime-shape contract must hold
  * regardless of which engine rule calls it. */
class RuntimeRangeFilterSpec extends AnyFunSuite
    with SparkSessionTestWrapper {

  import spark.implicits._

  private def freshDir(): String = {
    val d = Files.createTempDirectory("rtrange").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def stage(dir: String): Unit = {
    val df = spark.range(0, 400)
      .select(col("id"), (col("id") * lit(0.5)).as("v"))
    SnapshotTable.commit(spark, df.repartitionByRange(8, col("id")),
      dir, "overwrite", statsCols = Seq("id"))
  }

  private def scanOf(dir: String) = {
    val schema = spark.read.format("graft-table").load(dir).schema
    val opts = new java.util.HashMap[String, String]()
    opts.put("path", dir)
    new SnapshotTableScanBuilder(schema, dir,
      new CaseInsensitiveStringMap(opts)).build()
      .asInstanceOf[SnapshotTableScan]
  }

  test("a runtime range bound prunes file groups like a static one") {
    val dir = freshDir()
    stage(dir)
    val scan = scanOf(dir)
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      LessThanOrEqual("id", 60L)))
    val parts = scan.toBatch.planInputPartitions()
    val planned = SnapshotTableScan.lastPlanned.get(dir)
    assert(planned != null, "runtime-filtered plan must record telemetry")
    assert(planned._1 >= 1 && planned._1 * 2 <= planned._2,
      s"range bound must drop file groups: $planned")
    // the kept groups still hold every matching row
    val paths = parts.flatMap(_.asInstanceOf[GraftTablePartition].paths)
    val got = spark.read.orc(paths.toIndexedSeq: _*)
      .filter(col("id") <= 60L).count()
    assert(got === 61L)
  }

  test("runtime EqualTo prunes to the single covering group; a " +
    "GreaterThan bound composes with it") {
    val dir = freshDir()
    stage(dir)
    val scan = scanOf(dir)
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      EqualTo("id", 42L)))
    scan.toBatch.planInputPartitions()
    val p1 = SnapshotTableScan.lastPlanned.get(dir)
    assert(p1 != null && p1._1 === 1, s"EqualTo must stab one group: $p1")

    val scan2 = scanOf(dir)
    scan2.filter(Array[org.apache.spark.sql.sources.Filter](
      GreaterThan("id", 350L)))
    scan2.toBatch.planInputPartitions()
    val p2 = SnapshotTableScan.lastPlanned.get(dir)
    assert(p2 != null && p2._1 >= 1 && p2._1 * 2 <= p2._2, s"$p2")
  }

  test("NaN guard: a lower bound on a double column keeps everything " +
    "(footers are NaN-blind)") {
    val dir = freshDir()
    val df = Seq((1L, 1.0), (2L, Double.NaN), (3L, 9.0)).toDF("id", "v")
    SnapshotTable.commit(spark, df.repartition(3, col("id")), dir,
      "overwrite", statsCols = Seq("id", "v"))
    val scan = scanOf(dir)
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      GreaterThan("v", 100.0)))
    scan.toBatch.planInputPartitions()
    val p = SnapshotTableScan.lastPlanned.get(dir)
    // the filter is unusable on a float/double lower bound: no pruning
    assert(p == null || p._1 === p._2,
      s"NaN-blind lower bound must not prune: $p")
  }
}
