package graft

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{AcAutomaton, AcScrub}
import graft.operators.{GlobalIds, Similarity}

/** Round-10 batch-4 operators: GlobalIds partition-offset id assignment,
  * Aho-Corasick keyword scrub, nearest-centroid cluster assignment /
  * cluster-balanced cap, and margin-based bitext pair mining. */
class ClusterScrubIdsSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  // ------------------------------------------------------------------
  // GlobalIds
  // ------------------------------------------------------------------

  test("GlobalIds: dense 0..N-1 ids following the total order, multi-partition") {
    val rows = Random.shuffle((0 until 997).toList)
    val df = rows.toDF("k").repartition(7)
    val out = GlobalIds.assign(df, Seq(col("k")), "gid", partitions = 5)
      .select(col("k"), col("gid")).collect()
    assert(out.length === 997)
    // in k order the ids are exactly 0..996
    val byK = out.sortBy(_.getInt(0)).map(_.getLong(1)).toSeq
    assert(byK === (0L until 997L))
  }

  test("GlobalIds: deterministic across reruns and resilient to input partitioning") {
    val df1 = (0 until 300).map(i => (i % 7, i)).toDF("a", "b").repartition(3)
    val df2 = (0 until 300).map(i => (i % 7, i)).toDF("a", "b").repartition(11)
    def ids(df: org.apache.spark.sql.DataFrame) =
      GlobalIds.assign(df, Seq(col("a"), col("b")), "gid", partitions = 4)
        .select(col("a"), col("b"), col("gid")).collect()
        .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val m1 = ids(df1)
    val m2 = ids(df2)
    assert(m1 === m2)
    // matches the single-window reference assignment
    val ref = (0 until 300).map(i => (i % 7, i)).sorted.zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toMap
    assert(m1 === ref)
  }

  test("GlobalIds: correct over an AGGREGATED input (regression)") {
    // The round-10 bug shape: an aggregation's intra-partition row order
    // is nondeterministic, so before the one-materialization fix the
    // counts branch and data branch could range-partition with different
    // sampled boundaries and permute ids. Repeat to catch flakiness.
    (1 to 5).foreach { _ =>
      val agg = (0 until 4000).map(i => (s"k${i % 1100}", i))
        .toDF("k", "v").repartition(13)
        .groupBy(col("k")).agg(min(col("v")).as("v"))
      val out = GlobalIds.assign(agg, Seq(col("k")), "gid", partitions = 7)
        .select(col("k"), col("gid")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val ref = (0 until 1100).map(i => s"k$i").sorted.zipWithIndex
        .map { case (k, i) => k -> i.toLong }.toMap
      assert(out === ref)
    }
  }

  test("GlobalIds: single-row and empty inputs") {
    assert(GlobalIds.assign(Seq(42).toDF("k"), Seq(col("k")), "gid", 4)
      .select("gid").as[Long].collect().toSeq === Seq(0L))
    assert(GlobalIds.assign(Seq.empty[Int].toDF("k"), Seq(col("k")), "gid", 4)
      .count() === 0L)
  }

  // ------------------------------------------------------------------
  // Aho-Corasick scrub
  // ------------------------------------------------------------------

  private def scrub(text: String, kws: Seq[String],
                    repl: String = "#"): (String, Int) = {
    val r = Seq(text).toDF("t")
      .select(AcScrub.scrub(col("t"), kws, repl).as("s"))
      .select(col("s.scrubbed"), col("s.n_matches")).head()
    (r.getString(0), r.getInt(1))
  }

  test("AcScrub: leftmost-longest beats shorter overlapping terms") {
    assert(scrub("a table part b", Seq("table part", "table", "part")) ===
      ("a # b", 1))
    assert(scrub("fast sort key here", Seq("fast sort key", "sort key")) ===
      ("# here", 1))
    // the longer term only PARTIALLY present -> shorter one fires
    assert(scrub("a table lamp", Seq("table part", "table")) ===
      ("a # lamp", 1))
  }

  test("AcScrub: suffix-link matches (classic he/she/his/hers)") {
    val kws = Seq("he", "she", "his", "hers")
    assert(scrub("ushers", kws) === ("u#rs", 1)) // "she" wins at pos 1
    assert(scrub("hishers", kws) === ("##", 2)) // "his" then "hers"
  }

  test("AcScrub: adjacency, boundaries, no-match, empty replacement") {
    assert(scrub("abab", Seq("ab")) === ("##", 2))
    assert(scrub("xx", Seq("x")) === ("##", 2))
    assert(scrub("clean text", Seq("zebra")) === ("clean text", 0))
    assert(scrub("aXbXc", Seq("X"), "") === ("abc", 2))
    assert(scrub("", Seq("x")) === ("", 0))
  }

  test("AcScrub: matches a longest-first regex alternation on random inputs") {
    val rnd = new Random(7)
    val alphabet = "abc"
    def randStr(n: Int) =
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    (1 to 200).foreach { _ =>
      val kws = (1 to (1 + rnd.nextInt(5)))
        .map(_ => randStr(1 + rnd.nextInt(4))).distinct
      val text = randStr(rnd.nextInt(40))
      val pattern = kws.sortBy(-_.length)
        .map(java.util.regex.Pattern.quote).mkString("|")
      val expected = text.replaceAll(pattern, "#")
      val nExpected = java.util.regex.Pattern.compile(pattern)
        .matcher(text).results().count().toInt
      assert(scrub(text, kws) === ((expected, nExpected)),
        s"kws=$kws text=$text")
    }
  }

  test("AcAutomaton: 2000-term dictionary, one-pass counts match naive scan") {
    val rnd = new Random(11)
    val kws = (1 to 2000)
      .map(_ => (0 until 3 + rnd.nextInt(5))
        .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
      .distinct.toArray
    val auto = new AcAutomaton(kws)
    val text = (0 until 3000).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    val matches = auto.findAll(text)
    // every reported span is a real keyword occurrence
    assert(matches.forall { case (s, l) =>
      kws.contains(text.substring(s, s + l)) })
    // and every naive occurrence is reported
    val naive = for {
      kw <- kws.toSeq
      i <- 0 to text.length - kw.length
      if text.regionMatches(i, kw, 0, kw.length)
    } yield (i, kw.length)
    assert(matches.toSet === naive.toSet)
  }

  // ------------------------------------------------------------------
  // Cluster assignment + balance
  // ------------------------------------------------------------------

  private val clusterRows = Seq(
    (0L, Seq(1.0, 0.0, 0.0)), // seed A
    (10L, Seq(0.0, 1.0, 0.0)), // seed B
    (1L, Seq(0.9, 0.1, 0.0)), // near A
    (2L, Seq(0.2, 0.8, 0.0)), // near B
    (3L, Seq(0.0, 0.0, 1.0)), // orthogonal to both -> tie at cos 0
    (4L, Seq(0.7, 0.0, 0.7))) // nearer A

  test("assignClusters: nearest centroid wins, exact tie takes smaller centroid id") {
    val emb = clusterRows.toDF("vec_id", "embedding")
    val seeds = Seq((0L, Seq(1.0, 0.0, 0.0)), (10L, Seq(0.0, 1.0, 0.0)))
    val got = Similarity.assignClusters(emb, "vec_id", "embedding", seeds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 0L, 1L -> 0L, 2L -> 10L, 3L -> 0L, 4L -> 0L,
      10L -> 10L))
  }

  test("clusterBalance: cap keeps first members in id order") {
    val emb = clusterRows.toDF("vec_id", "embedding")
    val seeds = Seq((0L, Seq(1.0, 0.0, 0.0)), (10L, Seq(0.0, 1.0, 0.0)))
    val got = Similarity.clusterBalance(emb, "vec_id", "embedding", seeds, cap = 2)
      .orderBy(col("cluster_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // cluster 0 members: 0,1,3,4 -> keeps 0,1 ; cluster 10 members: 2,10 -> both
    assert(got.toSeq === Seq((0L, 4L, 2L, 1L), (10L, 2L, 2L, 12L)))
  }

  // ------------------------------------------------------------------
  // Margin pairs
  // ------------------------------------------------------------------

  test("marginPairs: matches an in-test reference computation") {
    val rnd = new Random(3)
    def vec() = Seq.fill(8)(rnd.nextDouble() - 0.3)
    val srcRows = (0L until 12L).map(i => (i, vec()))
    val tgtRows = (100L until 112L).map(i => (i, vec()))
    val k = 3
    // reference: same formula over plain Scala doubles with the same
    // rounding discipline (6dp cosines, exact top-k mean)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      BigDecimal(dot / (na * nb)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    val cMap = (for { (x, av) <- srcRows; (y, bv) <- tgtRows }
      yield ((x, y), cos(av, bv))).toMap
    def topKMean(cs: Seq[(Long, Double)]): Double = {
      val top = cs.sortBy { case (id, c) => (-c, id) }.take(k)
      val sum = top.map { case (_, c) =>
        BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP) }.sum
      // mirror the operator exactly: exact decimal sum -> double, then ONE
      // IEEE double division
      sum.toDouble / top.length
    }
    val ax = srcRows.map { case (x, _) =>
      x -> topKMean(tgtRows.map { case (y, _) => (y, cMap((x, y))) }) }.toMap
    val ay = tgtRows.map { case (y, _) =>
      y -> topKMean(srcRows.map { case (x, _) => (x, cMap((x, y))) }) }.toMap
    val expected = srcRows.flatMap { case (x, _) =>
      val best = tgtRows.map { case (y, _) =>
        (y, cMap((x, y)) / ((ax(x) + ay(y)) / 2)) }
        .minBy { case (y, m) => (-m, y) }
      if (best._2 >= 1.0) Some((x, best._1,
        BigDecimal(best._2).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble))
      else None
    }.toSet

    val got = Similarity.marginPairs(
        srcRows.toDF("vec_id", "embedding"), tgtRows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = k, threshold = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
    // max strategy: one pair per source at most
    assert(got.toSeq.map(_._1).distinct.length === got.size)
  }

  test("marginPairsIvf: planted near-duplicate pairs survive the cell funnel") {
    val rnd = new Random(5)
    def vec() = Seq.fill(8)(rnd.nextDouble() - 0.5)
    val srcRows = (0L until 20L).map(i => (i, vec()))
    // targets = slightly perturbed copies of the sources
    val tgtRows = srcRows.map { case (i, v) =>
      (i + 100L, v.zipWithIndex.map { case (x, j) =>
        x * 0.95 + (if (j == 0) 0.05 else 0.0) })
    }
    val cents = srcRows.take(4).map(_._2) // 4 fixed centroids
    val got = Similarity.marginPairsIvf(
        srcRows.toDF("vec_id", "embedding"), tgtRows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 3, threshold = 1.05,
        centroids = cents, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = srcRows.map { case (i, _) => (i, i + 100L) }.toSet
    // every emitted pair is a planted alignment, and most planted pairs
    // survive the 2-of-4-cell funnel (a source whose twin lands outside
    // its probed cells is the documented approximation)
    assert(got.subsetOf(planted))
    assert(got.size >= 15, s"funnel recall too low: ${got.size}/20")
  }

  test("marginPairs: hub target is penalized below a specific pair") {
    // hub b0 is moderately close to EVERY source; b1 is very close to a0
    // only. Raw cosine would often pick the hub; margin must pick b1 for
    // a0 with a larger margin than any hub pairing.
    val src = Seq(
      (0L, Seq(1.0, 0.0, 0.2)),
      (1L, Seq(0.0, 1.0, 0.2)),
      (2L, Seq(0.7, 0.7, 0.2))).toDF("vec_id", "embedding")
    val tgt = Seq(
      (100L, Seq(0.5, 0.5, 0.2)), // hub
      (101L, Seq(1.0, 0.05, 0.2))) // specific to src 0
      .toDF("vec_id", "embedding")
    val got = Similarity.marginPairs(src, tgt, "vec_id", "embedding",
        k = 2, threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val bySrc = got.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(bySrc(0L)._1 === 101L)
  }
}
