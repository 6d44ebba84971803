package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Profile, Retrieval}

/** Hand-computed hard-negative mining and key-skew audit. */
class NegativesSkewSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  test("hard negatives: positives drop, survivors re-rank, k caps") {
    val run = Seq(
      (0, 10L, 1L), (0, 11L, 2L), (0, 12L, 3L), (0, 13L, 4L), (0, 14L, 5L),
      (1, 20L, 1L), (1, 21L, 2L)
    ).toDF("query_id", "doc_id", "rank")
    val gold = Seq((0, 10L), (0, 12L), (1, 20L), (1, 21L))
      .toDF("query_id", "doc_id")
    val got = Retrieval.hardNegatives(run, gold, k = 2)
      .orderBy("query_id", "neg_rank").collect()
    // q0: negatives 11 (rank 2), 13 (rank 4) — 14 cut by k
    // q1: every candidate is gold -> no negatives at all
    assert(got === Array(
      Row(0, 1L, 11L, 2L), Row(0, 2L, 13L, 4L)))
  }

  test("key skew: stats and heavy keys over a hand distribution") {
    // key 1 x6, key 2 x3, keys 3..5 x1 -> n_keys 5, n_rows 12, max 6
    val df = (Seq.fill(6)(1L) ++ Seq.fill(3)(2L) ++ Seq(3L, 4L, 5L))
      .toDF("k")
    val got = Profile.keySkew(df, "k", topN = 2).orderBy("rk").collect()
    assert(got.length === 2)
    assert(got(0).getLong(1) === 1L && got(0).getLong(2) === 6L)
    assert(got(1).getLong(1) === 2L && got(1).getLong(2) === 3L)
    assert(got(0).getLong(3) === 5L && got(0).getLong(4) === 12L)
    assert(got(0).getDouble(5) === 1.0)  // p50 of (6,3,1,1,1) = 1
    assert(got(0).getDouble(7) === 6.0)  // max/p50
  }

  test("keySkew rejects non-integral keys loudly") {
    val df = Seq(("a", 1)).toDF("k", "v")
    intercept[IllegalArgumentException] { Profile.keySkew(df, "k") }
  }
}
