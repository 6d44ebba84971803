package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.ConversionJob.JobConfig
import graft.sinks.OrcSink

/** ConversionJob resume mode: a re-run skips tables whose output already
  * carries a verified success marker (attempts = 0 in the tally), and
  * re-exports on schema drift, tampered output, or a missing marker —
  * the 500-table-export-dies-at-400 operability contract. */
class ResumeSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val sf = "/root/testdata/sf0.001"

  private def cfg(out: String) = JobConfig(outputDir = out,
    parallelWorkers = 2, retries = 0, retryBackoffMs = 10,
    logFile = None, resume = true)

  test("verified write leaves a marker; read-back ignores it") {
    val out = Files.createTempDirectory("resume_marker").toString
    val rep = OrcSink.write(Tables.t(spark, sf, "region"), out, "region")
    val m = OrcSink.readMarker(spark, s"$out/region")
    assert(m.isDefined)
    assert(m.get.rows == rep.rows && m.get.files == rep.files)
    assert(m.get.schemaDdl == Tables.t(spark, sf, "region").schema.toDDL)
    // the underscore-prefixed marker is invisible to the ORC reader
    assert(OrcSink.read(spark, s"$out/region").count() == rep.rows)
  }

  test("resume skips verified tables (attempts=0), exports the rest") {
    val out = Files.createTempDirectory("resume_skip").toString
    // first run: good exports, bad fails -> 1/2
    var fixed = false
    def badThunk() =
      if (fixed) Tables.t(spark, sf, "nation")
      else spark.read.parquet("/nonexistent/resume.parquet")
    val tables = Seq(
      "region" -> (() => Tables.t(spark, sf, "region")),
      "nation" -> (() => badThunk()))
    val r1 = ConversionJob.run(tables, cfg(out))
    assert(r1.successes == 1 && r1.total == 2)
    // second run with the source fixed: region is SKIPPED (attempts=0,
    // rows from the marker), nation exports for real
    fixed = true
    val r2 = ConversionJob.run(tables, cfg(out))
    assert(r2.successes == 2)
    val region = r2.results.find(_.table == "region").get
    assert(region.success && region.attempts == 0 && region.rows == 5)
    val nation = r2.results.find(_.table == "nation").get
    assert(nation.success && nation.attempts == 1 && nation.rows == 25)
    assert(r2.summary == "Export completed: 2/2 tables successful")
  }

  test("resume re-exports on source schema drift") {
    val out = Files.createTempDirectory("resume_drift").toString
    val base = Seq("region" -> (() => Tables.t(spark, sf, "region")))
    assert(ConversionJob.run(base, cfg(out)).successes == 1)
    // same table name, WIDER source schema -> the marker's DDL no longer
    // matches and resume must re-export, not trust stale output
    import org.apache.spark.sql.functions.lit
    val drifted = Seq("region" ->
      (() => Tables.t(spark, sf, "region").withColumn("extra", lit(1L))))
    val r = ConversionJob.run(drifted, cfg(out))
    val res = r.results.head
    assert(res.success && res.attempts == 1)
    assert(OrcSink.read(spark, s"$out/region").columns.contains("extra"))
  }

  test("resume re-exports when part files were tampered with") {
    val out = Files.createTempDirectory("resume_tamper").toString
    val tables = Seq("nation" -> (() => Tables.t(spark, sf, "nation")))
    assert(ConversionJob.run(tables, cfg(out)).successes == 1)
    // delete one part file: marker no longer holds physically
    val dir = java.nio.file.Paths.get(s"$out/nation")
    val part = Files.list(dir).filter(_.toString.endsWith(".orc"))
      .findFirst().get()
    Files.delete(part)
    val r = ConversionJob.run(tables, cfg(out))
    val res = r.results.head
    assert(res.success && res.attempts == 1 && res.rows == 25)
    assert(OrcSink.read(spark, s"$out/nation").count() == 25)
  }

  test("resume=false (default) always re-exports") {
    val out = Files.createTempDirectory("resume_off").toString
    val tables = Seq("region" -> (() => Tables.t(spark, sf, "region")))
    val c = cfg(out).copy(resume = false)
    assert(ConversionJob.run(tables, c).successes == 1)
    val r = ConversionJob.run(tables, c)
    assert(r.results.head.attempts == 1) // real export, not a skip
  }

  test("in-place bucket merge invalidates the marker") {
    import org.apache.spark.sql.functions.{col, lit}
    val out = Files.createTempDirectory("resume_merge").toString
    val df = Tables.t(spark, sf, "region")
    OrcSink.writeKeyBucketed(df, out, "region", Seq("r_regionkey"), 2)
    assert(OrcSink.readMarker(spark, s"$out/region").isDefined)
    val changes = df.limit(1)
      .withColumn("__op", lit("D")).withColumn("__seq", lit(1L))
    OrcSink.mergeUpsertPruned(spark, s"$out/region", "region", changes,
      Seq("r_regionkey"))
    // the directory changed under the marker -> it must be gone
    assert(OrcSink.readMarker(spark, s"$out/region").isEmpty)
  }
}
