package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Retrieval

/** Hand-computed IR metrics: partial hits, total miss, perfect run, the
  * k cutoff, and the conjunctive gold criterion. */
class RetrievalMetricsSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  test("recall/MRR/nDCG per query, hand-computed at k=3") {
    // q0: gold {1,2,3,4}; run hits ranks 2 and 3
    // q1: gold {7}; run misses entirely
    // q2: gold {5}; run hits at rank 1
    val run = Seq(
      (0, 9L, 1L), (0, 2L, 2L), (0, 3L, 3L), (0, 4L, 4L), // rank 4 beyond k
      (1, 1L, 1L), (1, 2L, 2L), (1, 3L, 3L),
      (2, 5L, 1L), (2, 9L, 2L), (2, 8L, 3L)
    ).toDF("query_id", "doc_id", "rank")
    val gold = Seq((0, 1L), (0, 2L), (0, 3L), (0, 4L), (1, 7L), (2, 5L))
      .toDF("query_id", "doc_id")
    val got = Retrieval.evalMetrics(run, gold, k = 3)
      .orderBy("query_id").collect()
    // q0: dcg = r6(1/log2 3) + r6(1/log2 4) = 0.630930 + 0.5
    //     idcg = 1 + 0.630930 + 0.5; ndcg = r6(1.13093/2.13093)
    assert(got(0) === Row(0, 4L, 2L, 0.5, 0.5, 0.530721))
    assert(got(1) === Row(1, 1L, 0L, 0.0, 0.0, 0.0))
    assert(got(2) === Row(2, 1L, 1L, 1.0, 1.0, 1.0))
  }

  test("containsAllGold requires every term, normalized") {
    val docs = Seq(
      (1L, "the   Customer  placed an ORDER by the window"),
      (2L, "customer without the second term"),
      (3L, "order and window but no c-word")
    ).toDF("doc_id", "text")
    val gold = Retrieval.containsAllGold(docs, Seq(0 -> "Customer ORDER window"))
      .collect()
    assert(gold.toSeq === Seq(Row(0, 1L)))
  }
}
