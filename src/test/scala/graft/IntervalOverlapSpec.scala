package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** Interval-overlap join: half-open semantics, the canonical-bucket
  * dedup (multi-bucket pairs emit once), empty/touching intervals, and
  * brute-force equality on a random-ish fixture. */
class IntervalOverlapSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private def overlap(a: Seq[(Long, Long, Long, String)],
                      b: Seq[(Long, Long, Long, String)], w: Long) =
    RangeJoin.intervalOverlap(
      a.toDF("k", "a_s", "a_e", "a_id"), b.toDF("k", "b_s", "b_e", "b_id"),
      "k", "a_s", "a_e", "b_s", "b_e", bucketWidth = w)
      .select("k", "a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted.toSeq

  test("half-open semantics: touching intervals do not overlap; empties never match") {
    val got = overlap(
      Seq((1L, 0L, 10L, "a1"), (1L, 20L, 20L, "a2")), // a2 empty
      Seq((1L, 10L, 15L, "b1"),  // touches a1 at 10: NO overlap
        (1L, 9L, 11L, "b2"),     // overlaps a1 on [9,10)
        (2L, 0L, 100L, "b3")),   // different key
      w = 4L)
    assert(got === Seq((1L, "a1", "b2")))
  }

  test("a pair spanning many buckets emits exactly once") {
    val got = overlap(
      Seq((1L, 0L, 1000L, "wide")),
      Seq((1L, 500L, 2000L, "alsoWide")),
      w = 7L) // 143+ shared buckets
    assert(got === Seq((1L, "wide", "alsoWide")))
  }

  test("matches the brute-force overlap join on a dense fixture") {
    val as = (0L until 60L).map(i => (i % 5, i * 3, i * 3 + (i % 11) + 1, s"a$i"))
    val bs = (0L until 60L).map(i => (i % 5, i * 2 + 1, i * 2 + (i % 7) + 2, s"b$i"))
    val got = overlap(as, bs, w = 10L)
    val brute = for {
      (ka, sa, ea, ia) <- as
      (kb, sb, eb, ib) <- bs
      if ka == kb && sa < eb && sb < ea
    } yield (ka, ia, ib)
    assert(got === brute.sorted)
    assert(got.nonEmpty)
  }
}
