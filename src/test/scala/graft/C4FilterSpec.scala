package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.C4Filter

/** Hand-computed coverage of every published C4 rule (Raffel et al. 2020
  * §2.2): per-line terminal punctuation / minimum words / term drops,
  * page-level lorem-ipsum / curly-brace / minimum-retained-lines drops,
  * ordered reassembly, and partitioning invariance.
  */
class C4FilterSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private def clean(rows: Seq[(Long, String)]) =
    C4Filter.clean(rows.toDF("id", "text"), "id", "text")
      .orderBy("id").collect()

  test("each line rule drops exactly its target line; survivors rejoin in order") {
    val page = Seq(
      "one two three four five.",   // kept
      "no terminal punctuation here at all", // dropped: no terminal punct
      "too short words.",           // dropped: < 5 words
      "please enable JavaScript to continue here.", // dropped: term (case-insensitive)
      "is this a five word question?", // kept (?)
      "he said \"quote ends the line\"" // kept (end quotation mark)
    ).mkString("\n")
    val got = clean(Seq((1L, page)))
    assert(got === Array(Row(1L, 6L, 3L, true,
      Seq("one two three four five.",
        "is this a five word question?",
        "he said \"quote ends the line\"").mkString("\n"))))
  }

  test("page drops: lorem ipsum, curly brace, too few retained lines") {
    val goodLine = "a perfectly fine retained sentence."
    val got = clean(Seq(
      (1L, Seq(goodLine, goodLine, goodLine).mkString("\n")), // kept
      (2L, Seq(goodLine, goodLine, "standard Lorem Ipsum filler text here.")
        .mkString("\n")), // phrase kills the page (case-insensitive)
      (3L, Seq(goodLine, goodLine, "var config = { a: one two three }.")
        .mkString("\n")), // brace kills the page
      (4L, Seq(goodLine, goodLine, "short.").mkString("\n")))) // only 2 retained
    assert(got.map(r => (r.getLong(0), r.getBoolean(3))) ===
      Array((1L, true), (2L, false), (3L, false), (4L, false)))
    // the brace/phrase pages still report their retained-line counts
    assert(got.map(r => (r.getLong(1), r.getLong(2))).toSeq ===
      Seq((3L, 3L), (3L, 3L), (3L, 3L), (3L, 2L)))
  }

  test("whitespace normalizes before testing; empty and null text survive") {
    val got = clean(Seq(
      (1L, "  padded   line with  five words.  "),
      (2L, ""),
      (3L, null.asInstanceOf[String])))
    assert(got(0) === Row(1L, 1L, 1L, false, "padded line with five words."))
    // empty/null pages: 1 empty line, nothing retained, dropped, empty text
    assert(got(1) === Row(2L, 1L, 0L, false, ""))
    assert(got(2) === Row(3L, 1L, 0L, false, ""))
  }

  test("dials: minLineWords/minKeptLines/extra drop terms are honored") {
    val page = Seq("three word line.", "cookie policy notice applies today.",
      "a second good retained line.").mkString("\n")
    val got = C4Filter.clean(Seq((1L, page)).toDF("id", "text"), "id", "text",
        minLineWords = 3, minKeptLines = 2,
        lineDropTerms = Seq("javascript", "cookie policy"))
      .collect()
    assert(got === Array(Row(1L, 3L, 2L, true,
      "three word line.\na second good retained line.")))
  }

  test("result is invariant under input partitioning") {
    val rows = (0L until 200L).map(i =>
      (i, (0 to (i % 5).toInt).map(j => s"line $j of page $i with words" +
        (if ((i + j) % 3 == 0) "." else "")).mkString("\n")))
    val df1 = rows.toDF("id", "text").repartition(1)
    val df7 = rows.toDF("id", "text").repartition(7)
    val a = C4Filter.clean(df1, "id", "text").orderBy("id").collect()
    val b = C4Filter.clean(df7, "id", "text").orderBy("id").collect()
    assert(a === b)
  }
}
