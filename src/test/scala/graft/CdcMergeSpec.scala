package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.OrcSink

/** Last-writer-wins semantics of the CDC upsert-merge. */
class CdcMergeSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private def base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("k", "name", "v")

  private def merged(changes: Seq[(Long, String, Double, String, Long)]) =
    OrcSink.mergeUpsert(base,
        changes.toDF("k", "name", "v", "__op", "__seq"), keyCols = Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))

  test("update replaces, insert adds, delete removes") {
    val out = merged(Seq(
      (1L, "a", 11.0, "U", 1L),
      (4L, "d", 40.0, "I", 1L),
      (2L, "b", 0.0, "D", 1L)))
    assert(out.toSeq == Seq((1L, "a", 11.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("highest sequence wins regardless of delivery order") {
    val out = merged(Seq(
      (1L, "a", 99.0, "U", 3L), // winner, delivered first
      (1L, "a", 55.0, "U", 2L),
      (1L, "a", 44.0, "U", 1L)))
    assert(out.toSeq.head == ((1L, "a", 99.0)))
  }

  test("a stale change (lower seq than an applied one) cannot resurrect") {
    val out = merged(Seq(
      (2L, "b", 0.0, "D", 5L),
      (2L, "b", 77.0, "U", 1L))) // stale update after the delete's seq
    assert(!out.exists(_._1 == 2L))
  }

  test("re-insert after delete keeps the key with the later row") {
    val out = merged(Seq(
      (3L, "c", 0.0, "D", 1L),
      (3L, "c2", 33.0, "I", 2L)))
    assert(out.exists(_ == ((3L, "c2", 33.0))))
  }

  test("schema evolution: new change columns widen the table, base reads null") {
    val changes = Seq((4L, "d", 40.0, "eu", "I", 1L), (1L, "a", 11.0, "us", "U", 1L))
      .toDF("k", "name", "v", "region", "__op", "__seq")
    val out = OrcSink.mergeUpsert(base, changes, keyCols = Seq("k"),
        allowNewColumns = true)
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(2), Option(r.getString(3)))).toSeq
    assert(out == Seq((1L, 11.0, Some("us")), (2L, 20.0, None),
      (3L, 30.0, None), (4L, 40.0, Some("eu"))))
    // without the flag the same batch is rejected
    intercept[IllegalArgumentException] {
      OrcSink.mergeUpsert(base, changes, keyCols = Seq("k"))
    }
  }

  test("a change batch DROPPING a base column is rejected even with evolution on") {
    val missing = Seq((1L, 1.0, "U", 1L)).toDF("k", "v", "__op", "__seq")
    intercept[IllegalArgumentException] {
      OrcSink.mergeUpsert(base, missing, keyCols = Seq("k"), allowNewColumns = true)
    }
  }

  test("pruned merge on a key-bucketed table equals the full merge; " +
    "untouched buckets stay byte-identical") {
    val root = java.nio.file.Files.createTempDirectory("graft_cdc_pruned").toString
    val big = spark.range(0, 200).selectExpr(
      "id AS k", "concat('n', id) AS name", "CAST(id AS DOUBLE) AS v")
    OrcSink.writeKeyBucketed(big, root, "tbl", keyCols = Seq("k"), numBuckets = 16)
    val dir = s"$root/tbl"
    assert(OrcSink.bucketCount(spark, dir).contains(16))
    val changes = Seq(
      (5L, "n5x", 55.0, "U", 1L),
      (6L, "n6", 0.0, "D", 1L),
      (1000L, "new", 1.0, "I", 1L)).toDF("k", "name", "v", "__op", "__seq")
    val affected = changes
      .select(OrcSink.bucketExpr(Seq("k"), 16).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    def untouchedFiles(): Map[String, Long] =
      new java.io.File(dir).listFiles().toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("__bucket="))
        .filterNot(f => affected.contains(f.getName.stripPrefix("__bucket=").toInt))
        .flatMap(_.listFiles().toSeq).filter(_.getName.endsWith(".orc"))
        .map(f => f.getPath -> f.lastModified()).toMap
    val before = untouchedFiles()
    assert(before.nonEmpty, "fixture must leave untouched buckets")
    val expected = OrcSink.mergeUpsert(big, changes, keyCols = Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    OrcSink.mergeUpsertPruned(spark, dir, "tbl", changes, keyCols = Seq("k"))
    val got = spark.read.orc(dir).select("k", "name", "v")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == expected)
    assert(untouchedFiles() == before)
  }

  test("pruned merge removes a bucket whose rows are all deleted and " +
    "creates new buckets for inserts") {
    val root = java.nio.file.Files.createTempDirectory("graft_cdc_prune2").toString
    val nB = 64
    val small = Seq((0L, "a", 0.0), (1L, "b", 1.0), (2L, "c", 2.0), (3L, "d", 3.0))
      .toDF("k", "name", "v")
    OrcSink.writeKeyBucketed(small, root, "tbl", keyCols = Seq("k"), numBuckets = nB)
    val dir = s"$root/tbl"
    def bucketOf(ks: Seq[Long]): Map[Long, Int] =
      ks.toDF("k").select(org.apache.spark.sql.functions.col("k"),
          OrcSink.bucketExpr(Seq("k"), nB).as("b"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = bucketOf(Seq(0L, 1L, 2L, 3L) ++ (9000L to 9063L))
    // delete every key sharing key 2's bucket -> that directory must go;
    // pick an insert key that hashes ELSEWHERE so the two claims don't alias
    val doomed = Seq(0L, 1L, 2L, 3L).filter(k => b(k) == b(2L))
    val insKey = (9000L to 9063L).find(k => b(k) != b(2L)).get
    val changes = (doomed.map(k => (k, "x", 0.0, "D", 1L)) :+
      ((insKey, "ins", 9.0, "I", 1L))).toDF("k", "name", "v", "__op", "__seq")
    OrcSink.mergeUpsertPruned(spark, dir, "tbl", changes, keyCols = Seq("k"))
    assert(!new java.io.File(dir, s"__bucket=${b(2L)}").exists())
    assert(new java.io.File(dir, s"__bucket=${b(insKey)}").exists())
    val kept = spark.read.orc(dir).select("k").collect().map(_.getLong(0)).toSet
    assert(kept == (Set(0L, 1L, 2L, 3L) -- doomed) + insKey)
  }

  test("pruned merge refuses a table without bucket metadata") {
    val root = java.nio.file.Files.createTempDirectory("graft_cdc_plain").toString
    OrcSink.write(base, root, "tbl")
    val changes = Seq((1L, "a", 9.0, "U", 1L)).toDF("k", "name", "v", "__op", "__seq")
    intercept[IllegalArgumentException] {
      OrcSink.mergeUpsertPruned(spark, s"$root/tbl", "tbl", changes, keyCols = Seq("k"))
    }
  }

  test("schema contract violations fail loudly") {
    val noSeq = Seq((1L, "a", 1.0, "U")).toDF("k", "name", "v", "__op")
    intercept[IllegalArgumentException] {
      OrcSink.mergeUpsert(base, noSeq, keyCols = Seq("k"))
    }
    intercept[IllegalArgumentException] {
      OrcSink.mergeUpsert(base, base, keyCols = Seq("missing"))
    }
  }
}
