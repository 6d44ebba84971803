package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.{Dsir, NgramLm, Retrieval}

/** Degenerate-input behavior of the round-6 curation operators: empty
  * corpora, empty training slices, null text. The contract everywhere is
  * "empty result with the correct schema", never NaN/Infinity rows or a
  * crash in plan construction. */
class CurationEdgeSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "source", "text")

  test("NgramLm: empty training slice scores nothing, not NaN") {
    val corpus = docs((1L, "w", "a b c"), (2L, "w", "b c d"))
    val model = NgramLm.train(corpus.filter(col("source") === "absent"))
    val out = NgramLm.score(corpus, model)
    assert(out.columns.toSeq == Seq("doc_id", "n_bigrams", "mean_logprob", "ppl"))
    assert(out.count() == 0)
  }

  test("NgramLm: null text rows drop out of scoring") {
    val corpus = Seq((1L, "t", Some("a b a c")), (2L, "t", None))
      .toDF("doc_id", "source", "text")
    val model = NgramLm.train(corpus)
    assert(NgramLm.score(corpus, model)
      .select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("Dsir: empty target slice selects nothing, not null weights") {
    val corpus = docs((1L, "w", "x y"), (2L, "w", "y z"))
    val out = Dsir.select(corpus, isTarget = col("source") === "absent", n = 5)
    assert(out.columns.toSeq == Seq("doc_id", "n_feats", "logw", "rank"))
    assert(out.count() == 0)
  }

  test("Dsir: empty corpus selects nothing") {
    val corpus = docs().filter(col("doc_id") > 0)
    assert(Dsir.select(corpus, isTarget = col("source") === "t", n = 5).count() == 0)
  }

  test("Dsir: null-text docs contribute no features but target stats survive") {
    val corpus = Seq((1L, "t", Some("x y x")), (2L, "w", None), (3L, "w", Some("x y")))
      .toDF("doc_id", "source", "text")
    val out = Dsir.select(corpus, isTarget = col("source") === "t", n = 5)
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 3L)) // doc 2 has no grams, cannot be selected
  }

  test("bm25TopK: empty corpus and no-match queries return empty shaped results") {
    val empty = docs().filter(col("doc_id") > 0)
    val out = Retrieval.bm25TopK(empty, Seq(0 -> "anything"), k = 5)
    assert(out.columns.toSeq == Seq("query_id", "doc_id", "rank", "score"))
    assert(out.count() == 0)
    val corpus = docs((1L, "w", "alpha beta"))
    assert(Retrieval.bm25TopK(corpus, Seq(0 -> "missingterm"), k = 5).count() == 0)
  }

  test("bm25TopK: null text rows are skipped, others still rank") {
    val corpus = Seq((1L, "w", Some("alpha beta")), (2L, "w", None))
      .toDF("doc_id", "source", "text")
    val out = Retrieval.bm25TopK(corpus, Seq(0 -> "alpha"), k = 5)
      .collect().map(_.getLong(1)).toSeq
    assert(out == Seq(1L))
  }

  test("scrubContaminated cuts exactly the bench-overlapping tokens") {
    import graft.operators.Dedup
    val bench = Seq((100L, "q1 q2 q3 q4 q5 tail words here"))
      .toDF("doc_id", "text") // contributes windows incl. "q1..q5 tail words here"
    val corpus = Seq(
      (1L, "lead in q1 q2 q3 q4 q5 tail words here and more after"),
      (2L, "totally unrelated content with no overlap at all whatsoever"),
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Dedup.scrubContaminated(corpus, bench, "doc_id", "text",
        spanTokens = 8)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // doc 1: the single bench window "q1 q2 q3 q4 q5 tail words here"
    // covers tokens 3..10 -> exactly those 8 tokens cut
    assert(out(1L) == (("lead in and more after", 8L)))
    assert(out(2L) == (("totally unrelated content with no overlap at all whatsoever", 0L)))
    assert(out(3L) == (("", 0L))) // null text folds to empty, untouched
  }

  test("PII scrub: counts and redacts all three classes; order keeps them disjoint") {
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "mail a@b.co and c.d+x@e-f.org here"),
      (2L, "host 192.168.0.1 and 10.0.0.255"),
      (3L, "call 555-123-4567 or 555-000-1111"),
      (4L, "clean text no pii"),
      (5L, "user9@site10.com from 1.2.3.4 call 555-999-8888"),
      (6L, "version 1.2.3.4.5 build v1.2.3.4 at 999.1.1.1 or 300.1.2.3"))
      .toDF("id", "text")
      .select(col("id"),
        TextAnalysis.piiEmailCount(col("text")).as("e"),
        TextAnalysis.piiIpv4Count(col("text")).as("i"),
        TextAnalysis.piiPhoneCount(col("text")).as("p"),
        TextAnalysis.scrubPii(col("text")).as("s"))
    val rows = df.collect().map(r =>
      r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toMap
    assert(rows(1L)._1 == 2 && rows(1L)._4 == "mail [EMAIL] and [EMAIL] here")
    assert(rows(2L)._2 == 2 && rows(2L)._4 == "host [IP] and [IP]")
    assert(rows(3L)._3 == 2 && rows(3L)._4 == "call [PHONE] or [PHONE]")
    assert(rows(4L) == ((0, 0, 0, "clean text no pii")))
    // the email's digit-bearing domain is scrubbed as EMAIL, not as IP
    assert(rows(5L)._4 == "user9@[IP] call [PHONE]".replace("user9@[IP]",
      "[EMAIL] from [IP]"))
    // octet bounds + \b guards: digit-prefixed runs and >255 octets are
    // not IPs; a 5-part version string still matches its 4-octet prefix
    // (documented lookaround-free limitation)
    assert(rows(6L)._2 == 1 &&
      rows(6L)._4 == "version [IP].5 build v1.2.3.4 at 999.1.1.1 or 300.1.2.3")
  }

  test("BPE fertility: hand-computed tokens-per-word on a tiny corpus") {
    import graft.operators.TextAnalysis
    import graft.queries.LlmQueries
    // "er" is a pinned merge: "er er" -> 2 BPE tokens over 2 words
    // (fertility 1.0); "xq zz" has no merges -> 4 tokens over 2 words.
    val df = Seq(("en", "er er"), ("zh", "xq zz")).toDF("lang", "text")
      .select(col("lang"),
        size(graft.functions.BpeEncode.bpeTokens(col("text"),
          LlmQueries.PinnedBpeMerges)).cast("long").as("n_bpe"),
        TextAnalysis.tokenCount(col("text")).as("n_words"))
      .groupBy(col("lang"))
      .agg((sum(col("n_bpe")).cast("double") / sum(col("n_words"))).as("f"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(df("en") == 1.0 && df("zh") == 2.0)
  }

  test("hybridTopK: works when one leg is empty (lexical no-match)") {
    val d = docs((1L, "w", "alpha beta"), (2L, "w", "beta gamma"))
    val emb = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
        (0L, Array(0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    val out = Retrieval.hybridTopK(d, emb, Seq(0 -> "missingterm"),
      kIn = 5, kOut = 3)
    // vector leg alone still ranks; rrf scores reflect one contribution
    assert(out.count() > 0)
  }
}
