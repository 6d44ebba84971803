package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Privacy

/** Deterministic-Laplace DP counts: the draw replays the closed form,
  * epsilon scales noise inversely, seeds rotate the release, and the
  * epsilon guard fires. */
class PrivacySpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private def df = (Seq.fill(30)("a") ++ Seq.fill(70)("b")).toDF("g")

  private def draws(eps: Double, seed: String): Map[String, (Long, Double)] =
    Privacy.dpGroupCounts(df, "g", eps, seed).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

  test("draw replays the closed form exactly") {
    val got = draws(1.0, "s1")
    assert(got("a")._1 === 30L && got("b")._1 === 70L)
    // recompute the expected noise for group "a" from the same formula
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest("a:s1".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val u = (java.lang.Long.parseLong(md5.take(13), 16) + 0.5) / 4503599627370496.0
    val c = u - 0.5
    val noise = -1.0 * math.signum(c) * math.log(1.0 - 2.0 * math.abs(c))
    assert(got("a")._2 === math.round((30.0 + noise) * 10000) / 10000.0)
  }

  test("epsilon scales the noise inversely; seeds rotate the draw") {
    val e1 = draws(1.0, "s1")
    val e10 = draws(10.0, "s1")
    val other = draws(1.0, "s2")
    def noise(m: Map[String, (Long, Double)], g: String) =
      math.abs(m(g)._2 - m(g)._1)
    // same uniform, 10x epsilon => exactly 1/10th the noise (to rounding)
    assert(math.abs(noise(e10, "a") - noise(e1, "a") / 10.0) < 2e-4)
    assert(e1("a")._2 !== other("a")._2)
  }

  test("epsilon guard") {
    intercept[IllegalArgumentException] {
      Privacy.dpGroupCounts(df, "g", 0.0, "s")
    }
  }
}
