package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.NgramLm

/** Hand-computed interpolated-KN checks: training corpus "a b a c"
  * gives c(a,b)=c(b,a)=c(a,c)=1; c(a)=2, N1+(a,*)=2; c(b)=1,
  * N1+(b,*)=1; continuation counts a=b=c=1; B=3 bigram types. */
class NgramLmSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private def model = NgramLm.train(Seq((0L, "a b a c")).toDF("doc_id", "text"))

  private def scoreOf(text: String): (Long, Double) = {
    val r = NgramLm.score(Seq((1L, text)).toDF("doc_id", "text"), model)
      .collect().head
    (r.getAs[Long]("n_bigrams"), r.getAs[Double]("mean_logprob"))
  }

  private def r4(x: Double) =
    BigDecimal(BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("seen bigram: discounted count + interpolation mass") {
    // p(b|a) = (1-0.75)/2 + 0.75*(2/2)*(1/3) = 0.375
    assert(scoreOf("a b") == ((1L, r4(math.log(0.375)))))
  }

  test("seen history, unseen successor backs off to P_unk = 1/(2B)") {
    // p(z|a) = 0 + 0.75*(2/2)*(1/6) = 0.125
    assert(scoreOf("a z") == ((1L, r4(math.log(0.125)))))
  }

  test("unseen history scores successor by continuation prob alone") {
    // p(a|z) = Pcont(a) = 1/3
    assert(scoreOf("z a") == ((1L, r4(math.log(1.0 / 3)))))
  }

  test("both unseen: the pinned OOV floor") {
    assert(scoreOf("z q") == ((1L, r4(math.log(1.0 / 6)))))
  }

  test("each seen history distributes exactly unit mass over seen+cont") {
    // sum over w2 in vocab of p(w2|a) + OOV leakage must be ~1 when the
    // continuation distribution is complete: p(b|a)+p(c|a)+p(a|a)
    // = 0.375 + 0.375 + (0 + 0.75*1*(1/3)) = 1.0
    val ps = Seq("a b", "a c", "a a").map(t => math.exp(scoreOf(t)._2))
    assert(math.abs(ps.sum - 1.0) < 1e-3)
  }

  test("docs shorter than two tokens are excluded, not scored as zero") {
    val out = NgramLm.score(
      Seq((1L, "solo"), (2L, ""), (3L, "a b")).toDF("doc_id", "text"), model)
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("ppl is exp(-mean_logprob) of the rounded mean") {
    val r = NgramLm.score(Seq((1L, "a b")).toDF("doc_id", "text"), model)
      .collect().head
    val m = r.getAs[Double]("mean_logprob")
    assert(r.getAs[Double]("ppl") ==
      BigDecimal(math.exp(-m)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }
}
