package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Retrieval

/** Planted-corpus laws for PRF expansion: recall gain (a doc sharing no
  * original query term becomes reachable through an expansion term mined
  * from the feedback docs), original-term exclusion, and the fbTerms
  * cap. */
class PrfSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  // d0-d2: contain the query term plus "beta" (the signal term PRF should
  // mine). d3: "beta" WITHOUT the query term — invisible to plain BM25,
  // reachable after expansion. d4-d9: background noise making "beta"
  // non-universal (so its idf, and thus escore, stays competitive).
  private val docs = Seq(
    (0L, "alpha beta topic words one"),
    (1L, "alpha beta more lines two"),
    (2L, "alpha beta extra text three"),
    (3L, "beta only here nothing else"),
    (4L, "noise words about other things"),
    (5L, "entirely different content here now"),
    (6L, "more unrelated filler text lines"),
    (7L, "plain background document four terms"),
    (8L, "another background document some terms"),
    (9L, "final background document extra terms")
  ).toDF("doc_id", "text")

  private val queries = Seq(0 -> "alpha")

  test("expansion reaches feedback-term-only docs plain BM25 cannot") {
    val plain = Retrieval.bm25TopK(docs, queries, k = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(plain === Set(0L, 1L, 2L)) // only alpha-bearing docs

    val prf = Retrieval.bm25PrfTopK(docs, queries, k = 10,
      fbDocs = 3, fbTerms = 1)
    val ids = prf.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.contains(3L), s"expansion should reach doc 3, got $ids")
    // the alpha docs still rank above the expansion-only doc: they match
    // both the original and the expanded term
    val byRank = prf.orderBy("rank").collect().map(_.getLong(1))
    assert(byRank.take(3).toSet === Set(0L, 1L, 2L))
  }

  test("expansion never re-selects an original query term") {
    // feed a query whose own term dominates the feedback docs: with the
    // original term excluded, expansion must pick something else and the
    // result set still equals a valid BM25 over alpha + that term —
    // verified indirectly: every returned doc contains alpha or beta
    val prf = Retrieval.bm25PrfTopK(docs, queries, k = 10,
      fbDocs = 3, fbTerms = 1)
    val ids = prf.select("doc_id").collect().map(_.getLong(0)).toSet
    val withAlphaOrBeta = docs.collect()
      .filter(r => r.getString(1).contains("alpha") ||
        r.getString(1).contains("beta"))
      .map(_.getLong(0)).toSet
    assert(ids.subsetOf(withAlphaOrBeta))
  }

  test("fbTerms caps the expansion breadth") {
    // with zero expansion terms PRF degenerates to plain BM25 exactly
    val plain = Retrieval.bm25TopK(docs, queries, k = 10).collect().toSeq
    val prf0 = Retrieval.bm25PrfTopK(docs, queries, k = 10,
      fbDocs = 3, fbTerms = 0).collect().toSeq
    assert(prf0 === plain)
  }
}
