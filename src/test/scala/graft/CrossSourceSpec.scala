package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Cross-stratum exact-overlap matrix: hand-computed pair counts,
  * whitespace-insensitive fingerprinting, within-source dups counted
  * once, boilerplate-in-every-source boundedness, invariance. */
class CrossSourceSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  test("hand-computed matrix; in-source dups collapse; normalization applies") {
    val docs = Seq(
      (1L, "a", "shared one"),
      (2L, "a", "shared  one "),   // same content after normalization
      (3L, "a", "only in a"),
      (4L, "b", "shared one"),
      (5L, "b", "shared two"),
      (6L, "c", "shared two"),
      (7L, "c", "shared one")
    ).toDF("doc_id", "source", "text")
    val got = Dedup.crossStratumOverlap(docs, "source", "text")
      .orderBy("src_a", "src_b").collect()
    assert(got === Array(
      Row("a", "b", 1L), // "shared one"
      Row("a", "c", 1L),
      Row("b", "c", 2L))) // "shared one" + "shared two"
  }

  test("boilerplate in every source yields the full matrix, once per pair") {
    val n = 6
    val docs = (0 until n).flatMap(i =>
      Seq((i.toLong * 2, s"s$i", "universal boilerplate"),
        (i.toLong * 2 + 1, s"s$i", "universal boilerplate")))
      .toDF("doc_id", "source", "text")
    val got = Dedup.crossStratumOverlap(docs, "source", "text").collect()
    assert(got.length === n * (n - 1) / 2)
    assert(got.forall(_.getLong(2) === 1L))
  }

  test("invariant under input partitioning") {
    val docs = (0L until 300L)
      .map(i => (i, s"s${i % 5}", s"content ${i % 7}")) // 7 coprime with 5: contents cross sources
    val a = Dedup.crossStratumOverlap(docs.toDF("doc_id", "source", "text")
      .repartition(1), "source", "text").orderBy("src_a", "src_b").collect()
    val b = Dedup.crossStratumOverlap(docs.toDF("doc_id", "source", "text")
      .repartition(7), "source", "text").orderBy("src_a", "src_b").collect()
    assert(a === b)
    assert(a.nonEmpty)
  }
}
