package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JaroWinkler

/** Pins the native Jaro-Winkler expression against the classic published
  * values and DuckDB's exact doubles (same parameterization: 0.7 boost
  * threshold, prefix cap 4, scaling 0.1, integer transposition halving),
  * plus edge cases and the bounded all-pairs operator's input cap.
  */
class JaroWinklerSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.jw(UTF8String.fromString(a), UTF8String.fromString(b))

  test("classic values match DuckDB's jaro_winkler_similarity exactly") {
    assert(jw("martha", "marhta") === 0.9611111111111111)
    assert(jw("dixon", "dicksonx") === 0.8133333333333332)
    assert(jw("dwayne", "duane") === 0.8400000000000001)
    assert(jw("Customer#000000102", "Customer#000000210") === 0.9888888888888889)
    assert(jw("abc", "abc") === 1.0)
  }

  test("edge cases: empties, no matches, window-0 transpositions") {
    assert(jw("", "") === 1.0)
    assert(jw("", "x") === 0.0)
    assert(jw("abc", "xyz") === 0.0)
    // window max(2,2)/2-1 = 0: only same-position matches, so a plain
    // swap scores 0 (the DuckDB-verified convention)
    assert(jw("ab", "ba") === 0.0)
  }

  test("prefix boost caps at 4 and fires only above the 0.7 threshold") {
    // long shared prefix: boost uses p=4 even though 15 chars match
    val boosted = jw("Customer#000000123", "Customer#000000124")
    assert(boosted === 0.9777777777777777)
    // low-jaro pair stays unboosted despite a shared first char
    val lowJaro = jw("american", "axxxxxxx")
    assert(lowJaro <= 0.7 + 1e-9)
  }

  test("expression path equals the scalar; codegen stays on") {
    val df = Seq(("martha", "marhta"), ("dixon", "dicksonx"))
      .toDF("a", "b")
      .select(JaroWinkler.jaroWinkler(col("a"), col("b")).as("jw"))
    assert(df.collect().map(_.getDouble(0)).toSeq ===
      Seq(0.9611111111111111, 0.8133333333333332))
  }

  test("jaroWinklerPairs enforces its all-pairs input cap") {
    val big = (0L until 50L).map(i => (i, s"name$i")).toDF("id", "s")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Dedup.jaroWinklerPairs(big, "id", "s",
        minSim = 0.9, maxInputRows = 10).count()
    }
    assert(e.getMessage.contains("all-pairs"))
  }
}
