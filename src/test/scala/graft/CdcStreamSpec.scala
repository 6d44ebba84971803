package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

import graft.sinks.OrcSink
import graft.streaming.EventStream

/** Streaming CDC apply loop: ordered file batches -> merged ORC table. */
class CdcStreamSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private val changeSchema = StructType(Seq(
    StructField("k", LongType), StructField("v", DoubleType),
    StructField("__op", StringType), StructField("__seq", LongType)))

  test("ordered batches apply in sequence; checkpoint makes re-runs idempotent") {
    val root = java.nio.file.Files.createTempDirectory("graft_cdc_stream").toString
    OrcSink.write(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"), root, "tbl")
    val chDir = s"$root/changes"
    new java.io.File(chDir).mkdirs()
    val t0 = System.currentTimeMillis() - 60000L
    def land(i: Int, rows: Seq[(Long, Double, String, Long)]): Unit = {
      val staging = s"$root/stage$i"
      rows.toDF("k", "v", "__op", "__seq")
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val landed = new java.io.File(chDir, f"batch_$i%03d.parquet")
      java.nio.file.Files.move(part.toPath, landed.toPath)
      landed.setLastModified(t0 + i * 2000L)
    }
    land(0, Seq((1L, 11.0, "U", 1L), (3L, 30.0, "I", 1L)))
    land(1, Seq((2L, 0.0, "D", 2L), (1L, 12.0, "U", 2L)))

    EventStream.cdcApply(spark, chDir, changeSchema, root, "tbl",
      keyCols = Seq("k"), checkpointDir = s"$root/_cp")
    def state() = OrcSink.read(spark, s"$root/tbl").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(state() == Seq((1L, 12.0), (3L, 30.0)))

    // same checkpoint, no new files: nothing reapplies
    EventStream.cdcApply(spark, chDir, changeSchema, root, "tbl",
      keyCols = Seq("k"), checkpointDir = s"$root/_cp")
    assert(state() == Seq((1L, 12.0), (3L, 30.0)))

    // a later-landing batch continues from the checkpoint
    land(2, Seq((3L, 33.0, "U", 3L)))
    EventStream.cdcApply(spark, chDir, changeSchema, root, "tbl",
      keyCols = Seq("k"), checkpointDir = s"$root/_cp")
    assert(state() == Seq((1L, 12.0), (3L, 33.0)))
  }

  test("a key-bucketed base routes to the partition-scoped merge: " +
    "untouched bucket files untouched across micro-batches") {
    val root = java.nio.file.Files.createTempDirectory("graft_cdc_stream_b").toString
    val nB = 32
    val base = spark.range(0, 100).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    OrcSink.writeKeyBucketed(base, root, "tbl", keyCols = Seq("k"), numBuckets = nB)
    val chDir = s"$root/changes"
    new java.io.File(chDir).mkdirs()
    val t0 = System.currentTimeMillis() - 60000L
    def land(i: Int, rows: Seq[(Long, Double, String, Long)]): Unit = {
      val staging = s"$root/stage$i"
      rows.toDF("k", "v", "__op", "__seq")
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val landed = new java.io.File(chDir, f"batch_$i%03d.parquet")
      java.nio.file.Files.move(part.toPath, landed.toPath)
      landed.setLastModified(t0 + i * 2000L)
    }
    land(0, Seq((7L, 77.0, "U", 1L), (500L, 5.0, "I", 1L)))
    land(1, Seq((8L, 0.0, "D", 2L)))
    val touched = Seq(7L, 500L, 8L).toDF("k")
      .select(OrcSink.bucketExpr(Seq("k"), nB).as("b"))
      .collect().map(_.getInt(0)).toSet
    def untouchedMtimes(): Map[String, Long] =
      new java.io.File(s"$root/tbl").listFiles().toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("__bucket="))
        .filterNot(f => touched.contains(f.getName.stripPrefix("__bucket=").toInt))
        .flatMap(_.listFiles().toSeq).filter(_.getName.endsWith(".orc"))
        .map(f => f.getPath -> f.lastModified()).toMap
    val before = untouchedMtimes()
    assert(before.nonEmpty)
    EventStream.cdcApply(spark, chDir, changeSchema, root, "tbl",
      keyCols = Seq("k"), checkpointDir = s"$root/_cp")
    assert(untouchedMtimes() == before)
    val got = OrcSink.read(spark, s"$root/tbl").select("k", "v")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got(7L) == 77.0 && got(500L) == 5.0 && !got.contains(8L) &&
      got.size == 100) // 100 base - 1 delete + 1 insert
  }
}
