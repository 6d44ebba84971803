package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.NgramLm

/** CCNet perplexity bucketing: tercile balance, order-consistency
  * (head <= middle <= tail by ppl within each stratum), stratum
  * independence, and partitioning invariance. */
class PplBucketsSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  // two strata x 6 docs of sharply different predictability under a
  // model trained on repetitive "a b" text
  private def docs = Seq(
    (0L, "en", "a b a b a b a b a b"),
    (1L, "en", "a b a b a b x y"),
    (2L, "en", "a b x y z w q"),
    (3L, "en", "x y z w q r s t"),
    (4L, "en", "a b a b a b a b"),
    (5L, "en", "q r s t u v w"),
    (10L, "de", "a b a b a b"),
    (11L, "de", "a b x q"),
    (12L, "de", "z q r v w"),
    (13L, "de", "a b a b x"),
    (14L, "de", "u v w x y z"),
    (15L, "de", "a b a b a b a")
  ).toDF("doc_id", "lang", "text")

  private def buckets = {
    val model = NgramLm.train(docs.filter(col("doc_id").isin(0L, 4L, 10L)))
    NgramLm.pplBuckets(docs, model, "lang")
  }

  test("terciles balance and order by ppl within each stratum") {
    val got = buckets.collect().map(r =>
      (r.getString(1), r.getDouble(2), r.getString(3)))
    val byLang = got.groupBy(_._1)
    assert(byLang.keySet === Set("en", "de"))
    for ((_, rows) <- byLang) {
      val byBucket = rows.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
      assert(byBucket.keySet === Set("head", "middle", "tail"))
      // equal-ppl ties land whole in one tercile (<= cut), so exact
      // 2/2/2 balance is not guaranteed — coverage and ordering are
      assert(byBucket.values.map(_.size).sum === 6)
      assert(byBucket.values.forall(_.nonEmpty))
      assert(byBucket("head").max <= byBucket("middle").min)
      assert(byBucket("middle").max <= byBucket("tail").min)
    }
  }

  test("assignment is invariant under input partitioning") {
    val model = NgramLm.train(docs.filter(col("doc_id").isin(0L, 4L, 10L)))
    val a = NgramLm.pplBuckets(docs.repartition(1), model, "lang")
      .orderBy("doc_id").collect()
    val b = NgramLm.pplBuckets(docs.repartition(5), model, "lang")
      .orderBy("doc_id").collect()
    assert(a === b)
  }
}
