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
