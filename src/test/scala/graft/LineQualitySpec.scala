package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LineQuality

/** Gopher line-repetition rules: hand-computed fractions (duplicate
  * lines and their characters, ellipsis, bullets), threshold behavior,
  * degenerate docs, invariance. */
class LineQualitySpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  test("hand-computed fractions and keep flags") {
    val boiler = "same line here" // 14 chars
    val got = LineQuality.signals(Seq(
      // 4 lines, one duplicated once: dup_line 1/4, dup chars 14/(14*2+10+12)
      (1L, Seq(boiler, boiler, "plain text", "more content").mkString("\n")),
      // every line unique, one ellipsis, one bullet: 1/4 each
      (2L, Seq("alpha beta", "tail goes on...", "- bullet item", "closing words").mkString("\n")),
      // 3 of 4 lines duplicated -> dup_line 2/4 = 0.5 > 0.3: dropped
      (3L, Seq(boiler, boiler, boiler, "unique").mkString("\n"))
    ).toDF("doc_id", "text")).orderBy("doc_id").collect()
    assert(got(0).getLong(1) === 4L)
    assert(got(0).getDouble(2) === 0.25) // 1 dup of 4
    assert(got(0).getDouble(3) === // 14 dup chars of 14+14+10+12
      math.round(14.0 / 50 * 10000) / 10000.0)
    assert(got(0).getBoolean(6) === false) // dup_char 0.28 > 0.2
    assert(got(1) === Row(2L, 4L, 0.0, 0.0, 0.25, 0.25, true))
    assert(got(2).getDouble(2) === 0.5)
    assert(got(2).getBoolean(6) === false)
  }

  test("unicode ellipsis and all bullet styles count") {
    val got = LineQuality.signals(Seq(
      (1L, "trails off…\n* star item\n• dot item\n- dash item")
    ).toDF("doc_id", "text")).collect()(0)
    assert(got.getDouble(4) === 0.25)
    assert(got.getDouble(5) === 0.75)
  }

  test("single-line and empty docs are stable") {
    val got = LineQuality.signals(Seq(
      (1L, "just one line"), (2L, "")).toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
    assert(got(0) === Row(1L, 1L, 0.0, 0.0, 0.0, 0.0, true))
    assert(got(1) === Row(2L, 1L, 0.0, 0.0, 0.0, 0.0, true))
  }

  test("invariant under input partitioning") {
    val rows = (0L until 200L).map(i =>
      (i, (0 to (i % 5).toInt).map(j => s"line ${j % 2} of ${i % 7}").mkString("\n")))
    val a = LineQuality.signals(rows.toDF("doc_id", "text").repartition(1))
      .orderBy("doc_id").collect()
    val b = LineQuality.signals(rows.toDF("doc_id", "text").repartition(7))
      .orderBy("doc_id").collect()
    assert(a === b)
  }
}
