package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.CsvSource

/** Dialect sniffer semantics (`delimiter=auto`): quote-aware delimiter
  * scoring and the types-differ header heuristic. */
class CsvSniffSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def write(lines: Seq[String]): String = {
    val f = java.nio.file.Files.createTempFile("sniff", ".csv")
    java.nio.file.Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    f.toString
  }

  test("semicolon file with commas INSIDE quoted cells is not fooled") {
    val p = write(Seq(
      "id;name;city",
      "1;\"Doe, Jane\";berlin",
      "2;\"Roe; Richard\";paris", // even a quoted ';' must not count
      "3;plain;rome"))
    assert(CsvSource.sniffDialect(spark, p) === (";", true))
  }

  test("tab and pipe dialects detect; headerless numeric first row detects") {
    val tab = write(Seq("a\tb\tc", "1\t2\t3"))
    assert(CsvSource.sniffDialect(spark, tab) === ("\t", true))
    val pipe = write(Seq("10|x|y", "20|u|v", "30|w|z"))
    assert(CsvSource.sniffDialect(spark, pipe) === ("|", false))
  }

  test("all-text table defaults to header=true; degenerate inputs refuse") {
    val txt = write(Seq("name,city", "jane,berlin", "richard,paris"))
    assert(CsvSource.sniffDialect(spark, txt) === (",", true))
    val single = write(Seq("justonecolumn", "another"))
    val e = intercept[IllegalArgumentException] {
      CsvSource.sniffDialect(spark, single)
    }
    assert(e.getMessage.contains("no delimiter candidate"))
  }

  test("comma wins over an incidental pipe when commas are consistent") {
    val p = write(Seq(
      "id,expr,note",
      "1,a|b,first",
      "2,c,second",
      "3,d,third"))
    assert(CsvSource.sniffDialect(spark, p)._1 === ",")
  }
}
