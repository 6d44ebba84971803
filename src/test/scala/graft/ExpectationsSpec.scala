package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Expectations._

/** Planted violations for every check type (the gate's TPC-H suite only
  * exercises two failing polarities), NULL-handling boundaries, the
  * duplicate-excess definition, and both foreign-key legs. */
class ExpectationsSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private def result(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Boolean)] =
    df.collect().map(r => r.getString(1) -> (r.getLong(2), r.getBoolean(3))).toMap

  test("each check counts exactly its planted violations") {
    val df = Seq(
      (Some(1L), Some("a"), Some(5.0), Some("ok-1")),
      (Some(2L), Some("b"), Some(15.0), Some("ok-2")), // range high
      (Some(2L), Some("z"), Some(-1.0), Some("bad")),  // dup key, bad set, range low, regex
      (None, Some("a"), None, None)                    // null id; nulls skipped elsewhere
    ).toDF("id", "cat", "v", "tag")
    val got = result(check("t", df, Seq(
      NotNull("id"),
      Unique(Seq("id")),
      InSet("cat", Seq("a", "b")),
      InRange("v", 0.0, 10.0),
      MatchesRegex("tag", "^ok-\\d$"),
      RowCountAtLeast(10))))
    assert(got("not_null(id)") === (1L, false))
    assert(got("unique(id)") === (1L, false)) // two rows share id=2 -> 1 excess
    assert(got("in_set(cat)") === (1L, false)) // 'z'; NULL cat absent here
    assert(got("in_range(v)") === (2L, false)) // 15.0 and -1.0; NULL skipped
    assert(got("matches_regex(tag)") === (1L, false)) // 'bad'; NULL skipped
    assert(got("row_count_at_least(10)") === (6L, false)) // 10 - 4 rows
  }

  test("clean table passes every check with zero violations") {
    val df = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "cat", "v")
    val got = result(check("t", df, Seq(
      NotNull("id"), Unique(Seq("id")), InSet("cat", Seq("a", "b")),
      InRange("v", 0.0, 10.0), RowCountAtLeast(2))))
    assert(got.values.forall { case (v, p) => v == 0L && p })
  }

  test("multi-column uniqueness and duplicate-excess arithmetic") {
    // key (1,x): 3 rows -> 2 excess; key (2,y): 2 rows -> 1 excess
    val df = Seq((1L, "x"), (1L, "x"), (1L, "x"), (2L, "y"), (2L, "y"),
      (3L, "z")).toDF("a", "b")
    val got = result(check("t", df, Seq(Unique(Seq("a", "b")))))
    assert(got("unique(a,b)") === (3L, false))
  }

  test("foreign key: both broadcast and shuffled legs count orphans; null FKs skipped") {
    val ref = Seq(10L, 20L).toDF("k")
    val df = Seq(Some(10L), Some(20L), Some(30L), Some(40L), None)
      .toDF("fk")
    for (bcast <- Seq(true, false)) {
      val got = result(check("t", df,
        Seq(ForeignKey("fk", ref, "k", broadcastRef = bcast))))
      assert(got("foreign_key(fk->k)") === (2L, false)) // 30, 40
    }
  }

  test("empty table: shape checks pass vacuously, row-count floor fails by n") {
    val df = Seq.empty[(Long, String)].toDF("id", "cat")
    val got = result(check("t", df, Seq(
      NotNull("id"), Unique(Seq("id")), InSet("cat", Seq("a")),
      RowCountAtLeast(5))))
    assert(got("not_null(id)") === (0L, true))
    assert(got("unique(id)") === (0L, true))
    assert(got("in_set(cat)") === (0L, true))
    assert(got("row_count_at_least(5)") === (5L, false))
  }
}
