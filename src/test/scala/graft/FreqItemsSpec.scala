package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.functions.FreqItemsAgg

/** Misra-Gries summary: exactness above the vocabulary size, the
  * undercount bound below it, and merge behavior across partitionings. */
class FreqItemsSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  // skewed stream: "hot" 500x, "warm" 120x, 30 distinct cold items 10x each
  private def stream = {
    val items = Seq.fill(500)("hot") ++ Seq.fill(120)("warm") ++
      (0 until 30).flatMap(i => Seq.fill(10)(s"cold$i"))
    new scala.util.Random(11).shuffle(items).toDF("item")
  }

  private def summary(df: org.apache.spark.sql.DataFrame, k: Int): Map[String, Long] =
    df.agg(FreqItemsAgg.freqItems(col("item"), k).as("m"))
      .collect().head.getMap[String, Long](0).toMap

  test("k >= distinct count: counts are exact for every item") {
    val got = summary(stream, k = 64)
    assert(got("hot") == 500L && got("warm") == 120L)
    assert((0 until 30).forall(i => got(s"cold$i") == 10L))
  }

  test("k < distinct count: heavy items survive with the undercount bound") {
    val n = 500 + 120 + 300
    val k = 8
    val got = summary(stream, k)
    // every item with freq > n/(k+1) ~ 102 must be present
    assert(got.contains("hot") && got.contains("warm"))
    // estimates only ever undercount, by at most n/(k+1)
    val truth = Map("hot" -> 500L, "warm" -> 120L) ++
      (0 until 30).map(i => s"cold$i" -> 10L)
    got.foreach { case (item, est) =>
      assert(est <= truth(item), s"$item overcounted: $est > ${truth(item)}")
      assert(truth(item) - est <= n / (k + 1) + 1,
        s"$item undercounted past the bound: $est vs ${truth(item)}")
    }
  }

  test("bound holds regardless of partitioning (mergeable summaries)") {
    val n = 920
    for (parts <- Seq(1, 4, 13)) {
      val got = summary(stream.repartition(parts), k = 8)
      assert(got.contains("hot"), s"parts=$parts lost the heaviest item")
      assert(got("hot") >= 500L - n / 9 - 1 && got("hot") <= 500L,
        s"parts=$parts hot=${got("hot")}")
    }
  }

  test("nulls are ignored; empty input yields an empty summary") {
    val withNulls = Seq(Some("a"), None, Some("a"), None).toDF("item")
    assert(summary(withNulls, 4) == Map("a" -> 2L))
    assert(summary(stream.filter(lit(false)), 4) == Map.empty[String, Long])
  }
}
