package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ScdJoin

/** Point-in-time SCD2 join semantics: half-open boundaries (the cut
  * instant belongs to the NEW version), history gaps under inner vs
  * left, and broadcast-vs-shuffle plan equality. */
class ScdJoinSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private val fact = Seq(
    (1L, 5L, 10.0),   // inside v1
    (1L, 10L, 20.0),  // exactly at the cut -> v2 (half-open)
    (1L, 15L, 30.0),  // inside v2
    (2L, 7L, 40.0),   // inside key 2's only version
    (2L, 99L, 50.0)   // after key 2's history ends: a GAP
  ).toDF("k", "ts", "v")

  private val dim = Seq(
    (1L, "v1", 0L, 10L, "bronze"),
    (1L, "v2", 10L, 100L, "gold"),
    (2L, "only", 0L, 50L, "silver")
  ).toDF("k", "version", "valid_from", "valid_to", "attr")

  test("half-open windows: the boundary instant takes the new version") {
    val got = ScdJoin.pointInTime(fact, dim, "k", "ts")
      .select("k", "ts", "version").orderBy("k", "ts").collect()
    assert(got === Array(
      Row(1L, 5L, "v1"), Row(1L, 10L, "v2"), Row(1L, 15L, "v2"),
      Row(2L, 7L, "only"))) // the gap row drops under inner
  }

  test("left join keeps gap rows null-extended") {
    val got = ScdJoin.pointInTime(fact, dim, "k", "ts", how = "left")
      .orderBy("k", "ts").collect()
    assert(got.length === 5)
    val gap = got.last
    assert(gap.getLong(1) === 99L && gap.isNullAt(3)) // version null
  }

  test("broadcast and shuffle paths agree") {
    val a = ScdJoin.pointInTime(fact, dim, "k", "ts", broadcastDim = true)
      .orderBy("k", "ts").collect()
    val b = ScdJoin.pointInTime(fact, dim, "k", "ts", broadcastDim = false)
      .orderBy("k", "ts").collect()
    assert(a === b)
  }
}
