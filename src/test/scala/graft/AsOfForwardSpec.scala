package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

/** Pins the forward as-of join's edge semantics: inclusive equal-time
  * match, null when no following right row, genuinely-NULL right values
  * still matching (presence-struct contract), and mirror-consistency
  * with the backward join.
  */
class AsOfForwardSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  test("forward as-of: inclusive ties, null past the last right row") {
    val left = Seq((1L, 5L), (1L, 10L), (1L, 20L), (2L, 1L))
      .toDF("k", "t")
    val right = Seq((1L, 7L, 70.0), (1L, 10L, 100.0), (1L, 15L, 150.0))
      .toDF("k", "rt", "v")
    val got = AsOfJoin.firstValueAsOf(left, right, "k", "t", "rt", "v", "nxt")
      .orderBy("k", "t").collect()
    assert(got === Array(
      Row(1L, 5L, 70.0), // earliest following
      Row(1L, 10L, 100.0), // equal time matches (inclusive)
      Row(1L, 20L, null), // nothing follows
      Row(2L, 1L, null))) // key with no right rows at all
  }

  test("a NULL right value at the matching time is a match, not a skip") {
    val left = Seq((1L, 5L)).toDF("k", "t")
    val right = Seq((1L, 6L, null.asInstanceOf[java.lang.Double]),
      (1L, 8L, java.lang.Double.valueOf(80.0))).toDF("k", "rt", "v")
    val got = AsOfJoin.firstValueAsOf(left, right, "k", "t", "rt", "v", "nxt")
      .collect()
    // the 6-time row matches even though its value is NULL — DuckDB/pandas
    // ASOF semantics: nearness decides the match, not value nullness
    assert(got === Array(Row(1L, 5L, null)))
  }

  test("forward on reversed time equals backward on original time") {
    val left = Seq((1L, 5L), (1L, 12L)).toDF("k", "t")
    val right = Seq((1L, 4L, 40.0), (1L, 11L, 110.0)).toDF("k", "rt", "v")
    val back = AsOfJoin.lastValueAsOf(left, right, "k", "t", "rt", "v", "o")
      .orderBy("k", "t").collect()
    val fwd = AsOfJoin.firstValueAsOf(
        left.selectExpr("k", "-t AS t"),
        right.selectExpr("k", "-rt AS rt", "v"), "k", "t", "rt", "v", "o")
      .selectExpr("k", "-t AS t", "o").orderBy("k", "t").collect()
    assert(back === fwd)
  }

  test("nearest as-of: direction choice, midpoint tie goes backward") {
    val left = Seq((1L, 10L), (1L, 14L), (1L, 100L), (2L, 5L))
      .toDF("k", "t")
    val right = Seq((1L, 8L, 80L), (1L, 20L, 200L)).toDF("k", "rt", "v")
    val got = AsOfJoin.nearestValueAsOf(left, right, "k", "t", "rt", "v", "nv")
      .orderBy("k", "t").collect()
    assert(got === Array(
      Row(1L, 10L, 80L),   // dist 2 back vs 10 fwd -> backward
      Row(1L, 14L, 80L),   // dist 6 back vs 6 fwd: TIE -> backward
      Row(1L, 100L, 200L), // only backward candidates remain -> 20
      Row(2L, 5L, null)))  // key with no right rows
  }

  test("nearest as-of: forward-only and equal-time matches") {
    val left = Seq((1L, 3L), (1L, 8L)).toDF("k", "t")
    val right = Seq((1L, 8L, 88L)).toDF("k", "rt", "v")
    val got = AsOfJoin.nearestValueAsOf(left, right, "k", "t", "rt", "v", "nv")
      .orderBy("t").collect()
    // t=3: only a forward candidate; t=8: equal time -> distance 0
    assert(got === Array(Row(1L, 3L, 88L), Row(1L, 8L, 88L)))
  }

  test("nearest as-of rejects non-numeric time columns loudly") {
    val left = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("k", "t")
    val right = Seq((1L, 5L, 1L)).toDF("k", "rt", "v")
    intercept[IllegalArgumentException] {
      AsOfJoin.nearestValueAsOf(left, right, "k", "t", "rt", "v", "nv")
    }
  }
}
