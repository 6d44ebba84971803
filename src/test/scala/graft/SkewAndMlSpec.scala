package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, SkewJoin}

class SkewAndMlSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("saltedJoin equals plain join on skewed data") {
    // hot key: 'hot' carries 5000 rows, others 1 each
    val big = ((1 to 5000).map(i => ("hot", i.toLong)) ++
      (1 to 50).map(i => (s"k$i", i.toLong))).toDF("key", "rid")
    val small = (Seq("hot") ++ (1 to 50).map(i => s"k$i")).zipWithIndex
      .map { case (k, i) => (k, i * 10) }.toDF("key", "payload")
    val plain = big.join(small, "key").select("key", "rid", "payload")
      .collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedJoin(big, small, "key", col("rid"), salts = 8)
      .select("key", "rid", "payload").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.size == 5050)
  }

  test("saltedCountSum equals direct aggregation (decimal-exact)") {
    val df = ((1 to 3000).map(i => ("hot", i * 0.01)) ++
      (1 to 20).map(i => (s"k$i", i * 1.5))).toDF("key", "v")
    val direct = df.groupBy("key")
      .agg(count(lit(1)).as("n"), sum(Tables.dec(col("v"))).cast("double").as("sum_value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = SkewJoin.saltedCountSum(df, "key", col("v"), col("v"), salts = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == direct)
  }

  test("Spark ML MinHashLSH route finds the same planted near-dups as the custom funnel") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    val base = (0L until 30L).map(i =>
      (i, Seq.fill(60)(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    val dups = Seq(100L -> base(3), 101L -> base(17)).map { case (nid, (_, text)) =>
      val words = text.split(" "); words(30) = "CHANGED"; (nid, words.mkString(" "))
    }
    val df = (base ++ dups).toDF("id", "text")

    val custom = Dedup.minhashVerifiedPairs(df, "id", "text",
        k = 16, shingleSize = 5, bands = 8, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ml = Dedup.minhashMlPairs(df, "id", "text",
        shingleSize = 5, numHashTables = 8, maxJaccardDistance = 0.3)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet

    val planted = Set((3L, 100L), (17L, 101L))
    assert(planted.subsetOf(custom), s"custom missed: $custom")
    assert(planted.subsetOf(ml), s"ml missed: $ml")
  }
}
