package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Pins [[Dedup.editDistancePairs]]: the q-gram prefix filter must be
  * COMPLETE (output equals brute-force levenshtein all-pairs) across
  * substitutions, inserts, deletes, short strings, and repartitionings;
  * the maxDf dial drops hot-gram strings symmetrically and nothing else.
  */
class EditDistanceSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private def bruteForce(rows: Seq[(Long, String)], maxDist: Int) =
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      d = levenshteinDist(sa, sb) if d <= maxDist
    } yield (ia, ib, d.toLong)).sortBy(p => (p._1, p._2))

  private def levenshteinDist(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1) {
      j => if (i == 0) j else if (j == 0) i else 0
    })
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  private def run(rows: Seq[(Long, String)], maxDist: Int,
                  maxDf: Long = 0, parts: Int = 1) = {
    val df0 = rows.toDF("id", "s")
    val df = if (parts > 1) df0.repartition(parts) else df0
    Dedup.editDistancePairs(df, "id", "s", maxDist, q = 2, maxDf = maxDf)
      .orderBy("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  // one substitution, one insert, one delete, one transposition (= 2
  // edits under plain Levenshtein), one far string, one exact duplicate
  private val typos = Seq(
    1L -> "gradient descent", 2L -> "gradiant descent", // subst, d=1
    3L -> "gradient descents", // insert, d=1 from 1
    4L -> "gradien descent", // delete, d=1 from 1
    5L -> "gardient descent", // transposition, d=2 from 1
    6L -> "stochastic sampling", // far
    7L -> "gradient descent") // exact dup of 1, d=0

  test("funnel equals brute force at maxDist=1 and maxDist=2") {
    for (d <- Seq(1, 2)) {
      assert(run(typos, d) === bruteForce(typos, d), s"maxDist=$d")
    }
  }

  test("half-key partition route (maxDist=1) equals brute force on random edits") {
    // the d=1 dispatch is a different algorithm (pigeonhole half keys,
    // no gram index) — fuzz it against brute force over seeded random
    // strings with random substitutions/inserts/deletes at random
    // positions, plus length edge cases (empty, 1-char, 2-char)
    val rnd = new scala.util.Random(20260815L)
    val alpha = "abcde"
    def randStr(n: Int) =
      (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val bases = (0 until 40).map(_ => randStr(1 + rnd.nextInt(24)))
    val mutated = bases.flatMap { b =>
      val p = rnd.nextInt(b.length)
      val c = alpha(rnd.nextInt(alpha.length)).toString
      Seq(
        b.updated(p, c.head),                       // substitution
        b.substring(0, p) + c + b.substring(p),     // insert
        if (b.length > 1) b.substring(0, p) + b.substring(p + 1) else b)
    }
    val edge = Seq("", "a", "b", "ab", "ba", "", "a")
    val rows = (bases ++ mutated ++ edge).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }
    assert(run(rows, 1, parts = 7) === bruteForce(rows, 1))
  }

  test("output is partitioning-invariant") {
    assert(run(typos, 2, parts = 7) === run(typos, 2))
  }

  test("strings shorter than q pair through the sentinel bucket") {
    val rows = Seq(1L -> "a", 2L -> "b", 3L -> "", 4L -> "ab")
    // d("a","b")=1, d("a","")=1, d("b","")=1, d("a","ab")=1, d("b","ab")=1,
    // d("","ab")=2
    assert(run(rows, 1) === bruteForce(rows, 1))
    assert(run(rows, 2) === bruteForce(rows, 2))
  }

  test("maxDf drops hot-gram strings symmetrically, keeps the rest exact") {
    // "xx" appears in every padded string; with maxDf=2 the 'xx' gram
    // leaves the index, but every string still carries rarer grams so
    // nothing is lost and the result stays exact
    val rows = Seq(1L -> "xxalpha", 2L -> "xxalphb", 3L -> "xxbeta", 4L -> "xxbetb")
    assert(run(rows, 1, maxDf = 2) === bruteForce(rows, 1))
  }

  test("serve from the standing index equals direct batch-x-corpus compute") {
    val corpus = Seq(1L -> "gradient descent", 2L -> "stochastic sampling",
      3L -> "ab", 4L -> "x").toDF("id", "s")
    val batch = Seq(10L -> "gradiant descent", 11L -> "stochastic sampling!",
      12L -> "cb", 13L -> "y", 14L -> "unrelated phrase").toDF("id", "s")
    graft.operators.Dedup.buildEditIndex(corpus, "id", "s",
      "graft_test_edit_idx", q = 2, maxDistBound = 2)
    val served = graft.operators.Dedup.editDistanceServe(spark,
        "graft_test_edit_idx", batch, "id", "s", maxDist = 2)
      .orderBy("batch_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // direct truth over the cross product, incl. the short-short pairs
    // ("cb" vs "ab" d=1, "y" vs "x" d=1) that ride the sentinel bucket
    val corpusRows = Seq(1L -> "gradient descent", 2L -> "stochastic sampling",
      3L -> "ab", 4L -> "x")
    val batchRows = Seq(10L -> "gradiant descent", 11L -> "stochastic sampling!",
      12L -> "cb", 13L -> "y", 14L -> "unrelated phrase")
    val direct = (for {
      (bi, bs) <- batchRows; (ci, cs) <- corpusRows
      d = levenshteinDist(bs, cs) if d <= 2
    } yield (bi, ci, d.toLong)).sortBy(p => (p._1, p._2))
    assert(served === direct)
    assert(direct.contains((12L, 3L, 1L)) && direct.contains((13L, 4L, 1L)))
  }

  test("append folds an accepted batch in; the next batch matches against it") {
    val corpus = Seq(1L -> "alpha particle").toDF("id", "s")
    graft.operators.Dedup.buildEditIndex(corpus, "id", "s",
      "graft_test_edit_idx3", q = 2, maxDistBound = 2)
    val batch1 = Seq(10L -> "beta particle").toDF("id", "s")
    // batch1 matches nothing at distance 2 ("alpha"->"beta" is 4 edits)
    assert(graft.operators.Dedup.editDistanceServe(spark,
      "graft_test_edit_idx3", batch1, "id", "s", maxDist = 2).count() === 0)
    graft.operators.Dedup.appendToEditIndex(batch1, "id", "s",
      "graft_test_edit_idx3", q = 2, maxDistBound = 2)
    // batch2 is a typo of batch1: matches ONLY the appended row
    val batch2 = Seq(20L -> "beta particls").toDF("id", "s")
    val got = graft.operators.Dedup.editDistanceServe(spark,
        "graft_test_edit_idx3", batch2, "id", "s", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((20L, 10L, 1L)))
  }

  test("serve refuses a maxDist beyond the index's sentinel bound") {
    val corpus = Seq(1L -> "abc").toDF("id", "s")
    graft.operators.Dedup.buildEditIndex(corpus, "id", "s",
      "graft_test_edit_idx2", q = 2, maxDistBound = 1)
    val e = intercept[IllegalArgumentException] {
      graft.operators.Dedup.editDistanceServe(spark, "graft_test_edit_idx2",
        corpus, "id", "s", maxDist = 2, maxDistBound = 1)
    }
    assert(e.getMessage.contains("sentinel bound"))
  }

  test("sentinel gram is exempt from maxDf: short-short pairs survive a " +
      "corpus with more short strings than maxDf") {
    // 6 short strings (each a single 2-gram, pairwise distance 1) push the
    // sentinel's document frequency to 6 > maxDf=3; the sentinel exists for
    // completeness, not selectivity, so it must NOT be df-capped — capping
    // it silently dropped every short-short pair (the real grams here are
    // all distinct, so the sentinel bucket is the only candidate path)
    val rows = Seq(1L -> "ab", 2L -> "ac", 3L -> "ad", 4L -> "ae",
      5L -> "af", 6L -> "ag")
    assert(run(rows, 1, maxDf = 3) === bruteForce(rows, 1))
  }

  test("null strings are ignored, not crashed on") {
    val rows = Seq((1L, "abc"), (2L, "abd"))
    val withNull = rows.toDF("id", "s")
      .unionByName(Seq((9L, null.asInstanceOf[String])).toDF("id", "s"))
    val got = Dedup.editDistancePairs(withNull, "id", "s", 1, q = 2, maxDf = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 2L, 1L)))
  }
}
