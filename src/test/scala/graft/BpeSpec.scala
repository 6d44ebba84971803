package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.functions.{BpeEncode, BpeEncoder}
import graft.operators.BpeLearner
import graft.queries.LlmQueries

class BpeSpec extends AnyFunSuite with SparkSessionTestWrapper {

  /** Independent reference: GPT-2's published bpe() loop — repeatedly pick
    * the LOWEST-RANK pair present in the word and merge all its
    * leftmost-non-overlapping occurrences — deliberately a different
    * control flow from BpeEncoder's rank-order passes, so agreement
    * checks the rank-order/min-rank equivalence the oracle relies on. */
  private def gpt2Bpe(word: String, merges: Seq[(String, String)]): Seq[String] = {
    val rank = merges.zipWithIndex.toMap
    val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var w: Vector[String] = bytes.toVector.map(b => String.valueOf((b & 0xff).toChar))
    var done = false
    while (!done && w.length >= 2) {
      val pairs = w.indices.dropRight(1).map(i => (w(i), w(i + 1))).distinct
      val ranked = pairs.filter(rank.contains)
      if (ranked.isEmpty) done = true
      else {
        val (x, y) = ranked.minBy(rank)
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < w.length) {
          if (i + 1 < w.length && w(i) == x && w(i + 1) == y) { out += x + y; i += 2 }
          else { out += w(i); i += 1 }
        }
        w = out.result()
      }
    }
    w
  }

  private val enc = BpeEncoder(LlmQueries.PinnedBpeMerges.toList)

  test("encodeWord equals the GPT-2 min-rank reference on adversarial words") {
    val words = Seq(
      "vector", "vectors", "customer", "column", "join", "joining",
      "hash", "hashing", "batch", "scan", "filter", "order", "orders",
      "smallmerge", "slowscan", "a", "", "x",
      "erer", "ererer", "ininin", // overlapping same-pair runs
      "sts", "stst", "cancan", // merges that touch and chain
      "aaaa", "zzzz", // pairs absent from the table
      "vvector", "ectorector", "ctct", // partial prefixes of cascades
      "customercustomer", "ordercolumn")
    words.foreach { w =>
      assert(enc.encodeWord(w).toSeq == gpt2Bpe(w, LlmQueries.PinnedBpeMerges),
        s"mismatch on '$w'")
    }
  }

  test("encodeWord equals the reference on every pre-token of the fixture corpus") {
    val pat = java.util.regex.Pattern.compile(BpeEncoder.PreTokenPattern)
    val texts = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val seen = scala.collection.mutable.HashSet.empty[String]
    texts.foreach { t =>
      val m = pat.matcher(t)
      while (m.find()) seen += m.group()
    }
    assert(seen.nonEmpty)
    seen.foreach { w =>
      assert(enc.encodeWord(w).toSeq == gpt2Bpe(w, LlmQueries.PinnedBpeMerges),
        s"mismatch on corpus pre-token '$w'")
    }
  }

  test("deep 89-merge table: min-rank equivalence holds and in-vocab " +
    "words collapse to a single token") {
    val deep = BpeEncoder(LlmQueries.PinnedBpeMergesDeep.toList)
    val words = Seq(
      "vector", "customer", "table", "stream", "window", "spark",
      "group", "query", "sort", "value", "data", "fast", "the", "dup",
      "big", "part", "key", "line", "merge", "aggregate",
      "vectorvector", "tabletable", "streamline", "xyzzy", "")
    words.foreach { w =>
      assert(deep.encodeWord(w).toSeq == gpt2Bpe(w, LlmQueries.PinnedBpeMergesDeep),
        s"mismatch on '$w'")
    }
    // exhaustion property: the table trained until pair supply ran dry,
    // so the frequent vocabulary words its cascades cover are ONE token
    Seq("vector", "customer", "table", "stream", "window", "spark",
      "group", "query")
      .foreach { w => assert(deep.encodeWord(w).length == 1, s"'$w' not collapsed") }
  }

  test("expression output: boundaries respected, whitespace dropped, bytes preserved") {
    import spark.implicits._
    val df = Seq(
      "vector order", // two pre-tokens, both fully merged
      "vec tor", // split word must NOT merge across the boundary
      "er.er", // punctuation is its own pre-token
      "  padded\t\nws  ",
      "").toDF("text")
    val got = df.select(BpeEncode.bpeTokens(col("text"), LlmQueries.PinnedBpeMerges).as("t"))
      .as[Seq[String]].collect().toSeq
    assert(got(0) == Seq("vector", "order"))
    assert(got(1) == Seq("v", "e", "c", "t", "or"))
    assert(got(2) == Seq("er", ".", "er"))
    assert(got(3) == Seq("p", "a", "d", "d", "e", "d", "w", "s"))
    assert(got(4) == Seq.empty)
  }

  test("interpreted eval equals codegen eval") {
    import spark.implicits._
    val data = Seq("the vector joins a column batch", "ererer st st", "")
    val df = data.toDF("text")
    val viaCodegen = df
      .select(BpeEncode.bpeTokens(col("text"), LlmQueries.PinnedBpeMerges).as("t"))
      .as[Seq[String]].collect().toSeq
    val viaEncoder = data.map { s =>
      val pat = java.util.regex.Pattern.compile(BpeEncoder.PreTokenPattern)
      val out = Seq.newBuilder[String]
      val m = pat.matcher(s)
      while (m.find()) out ++= enc.encodeWord(m.group())
      out.result()
    }
    assert(viaCodegen == viaEncoder)
  }

  test("encoder rejects a non-well-formed merges table") {
    // (ab, c) before (a, b): rank-order application would silently skip
    // what GPT-2's loop merges — the encoder must refuse the table.
    intercept[IllegalArgumentException] {
      BpeEncoder(List(("ab", "c"), ("a", "b")))
    }
  }

  test("learner recovers the obvious merges from a toy corpus") {
    import spark.implicits._
    val df = (Seq.fill(50)("aaab") ++ Seq.fill(10)("cd")).toDF("text")
    val merges = BpeLearner.learnMerges(df, "text", 3)
    // "aaab" x50: pairs (a,a) x2 per word = 100, (a,b) x1 = 50, (c,d) = 10
    // round 1: (a,a) -> words become [aa, a, b]; round 2: pairs (aa,a)=50,
    // (a,b)=50, (c,d)=10 -> tie broken lexicographically: ("a","b")
    assert(merges == Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
  }

  test("learner/encoder round-trip: encoding the training corpus shrinks it") {
    import spark.implicits._
    val df = Seq("select the column", "select a column", "the column order")
      .toDF("text")
    val merges = BpeLearner.learnMerges(df, "text", 10)
    val e = BpeEncoder(merges.toList)
    val nTokens = e.encodeWord("column").length
    assert(nTokens < "column".length) // merges actually compress
  }
}
