package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.Dsir

/** Planted-distribution checks for DSIR importance selection. */
class DsirSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  // Curated slice speaks "alpha beta", the rest of the crawl speaks
  // "zeta eta"; two probe docs imitate one side each.
  private def corpus = Seq(
    (0L, "tgt", "alpha beta alpha beta alpha beta"),
    (1L, "tgt", "beta alpha beta alpha"),
    (2L, "web", "zeta eta zeta eta zeta"),
    (3L, "web", "eta zeta eta zeta"),
    (4L, "web", "alpha beta alpha beta"), // target-like raw doc
    (5L, "web", "zeta eta zeta")          // crawl-like raw doc
  ).toDF("doc_id", "source", "text")

  test("target-like docs outweigh crawl-like docs") {
    val out = Dsir.select(corpus, isTarget = col("source") === "tgt", n = 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(4L) > out(5L))
    assert(out(0L) > out(2L)) // the curated docs themselves score high
  }

  test("n_feats counts unigram + bigram instances") {
    val out = Dsir.select(corpus, isTarget = col("source") === "tgt", n = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 5: 3 tokens -> 3 unigrams + 2 bigrams = 5
    assert(out(5L) == 5L)
    // doc 0: 6 tokens -> 6 + 5 = 11
    assert(out(0L) == 11L)
  }

  test("single-token docs contribute only the unigram feature") {
    val one = Seq((0L, "t", "alpha beta"), (1L, "w", "solo")).toDF("doc_id", "source", "text")
    val out = Dsir.select(one, isTarget = col("source") === "t", n = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 1L)
  }

  test("rank is dense 1..n ordered by weight desc then id") {
    val out = Dsir.select(corpus, isTarget = col("source") === "tgt", n = 4)
      .orderBy(col("rank")).collect()
    assert(out.map(_.getLong(3)).toSeq == Seq(1L, 2L, 3L, 4L))
    val ws = out.map(_.getDouble(2)).toSeq
    assert(ws == ws.sorted(Ordering[Double].reverse))
  }

  test("bucket ids are stable across partitionings") {
    val a = Dsir.bucketTf(corpus, "doc_id", "text")
      .orderBy("doc_id", "bucket").collect().toSeq
    val b = Dsir.bucketTf(corpus.repartition(7), "doc_id", "text")
      .orderBy("doc_id", "bucket").collect().toSeq
    assert(a == b)
  }
}
