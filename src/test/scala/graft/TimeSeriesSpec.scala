package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TimeSeries

/** Pins the per-key EWMA fold: hand-computed recurrence values,
  * deterministic tie ordering, and partitioning invariance of the
  * sequential fold.
  */
class TimeSeriesSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  test("recurrence matches the hand-computed fold; s_1 seeds with x_1") {
    // alpha = 0.5: s = 10; 0.5*20+0.5*10 = 15; 0.5*40+0.5*15 = 27.5
    val df = Seq((1L, 1L, 1L, 10.0), (1L, 2L, 2L, 20.0), (1L, 3L, 3L, 40.0))
      .toDF("k", "t", "tie", "x")
    val r = TimeSeries.ewmaByKey(df, "k", "t", "tie", "x", alpha = 0.5)
      .collect()(0)
    assert(r.getLong(1) === 3L)
    assert(r.getDouble(2) === 27.5)
  }

  test("equal timestamps order by the tiebreak column") {
    // same t: tie order decides which value is folded last
    val df = Seq((1L, 5L, 2L, 100.0), (1L, 5L, 1L, 0.0))
      .toDF("k", "t", "tie", "x")
    val r = TimeSeries.ewmaByKey(df, "k", "t", "tie", "x", alpha = 0.5)
      .collect()(0)
    // fold order: x=0 (tie 1) then x=100 (tie 2): s = 0; 0.5*100+0 = 50
    assert(r.getDouble(2) === 50.0)
  }

  test("string key column fails loudly instead of null-collapsing groups") {
    val df = Seq(("u1", 1L, 1L, 10.0), ("u2", 2L, 2L, 20.0))
      .toDF("k", "t", "tie", "x")
    val e = intercept[IllegalArgumentException] {
      TimeSeries.ewmaByKey(df, "k", "t", "tie", "x", alpha = 0.5)
    }
    assert(e.getMessage.contains("must be integral"))
  }

  test("timestamp time column orders at microsecond precision") {
    // two events in the same SECOND: a cast("long") would coarsen both to
    // the same epoch second and leave ordering to the tiebreak; unix_micros
    // must keep them distinct so the later-micros value folds last
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00.000900"), 1L, 100.0),
      (1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00.000100"), 2L, 0.0))
      .toDF("k", "t", "tie", "x")
    val r = TimeSeries.ewmaByKey(df, "k", "t", "tie", "x", alpha = 0.5)
      .collect()(0)
    // fold order by micros: x=0 first, then x=100 -> 0.5*100 + 0.5*0 = 50
    // (a seconds-coarsened cast would order by tie instead: 100 then 0 -> 25)
    assert(r.getDouble(2) === 50.0)
  }

  test("fold is partitioning-invariant") {
    val rows = (0 until 500).map(i =>
      ((i % 7).toLong, i.toLong, i.toLong, math.sin(i) * 10))
    val a = TimeSeries.ewmaByKey(rows.toDF("k", "t", "tie", "x"),
      "k", "t", "tie", "x", 0.2).orderBy("k").collect().toSeq
    val b = TimeSeries.ewmaByKey(rows.toDF("k", "t", "tie", "x").repartition(11),
      "k", "t", "tie", "x", 0.2).orderBy("k").collect().toSeq
    assert(a === b)
  }
}
