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

  test("RangeJoin.pairs equals the naive range join on a hot-user fixture") {
    import graft.operators.RangeJoin
    // one hot user with 400 events in a tight burst (the skew case the
    // bucketed join exists for) + sparse users, window boundaries planted:
    // exactly +300s (inclusive) and +300.000001s (exclusive), same-ts pairs
    val base = java.sql.Timestamp.valueOf("2024-03-01 12:00:00")
    val rows = ((1 to 400).map(i => (7L, i.toLong, base.getTime * 1000 + i * 777000L)) ++
      Seq(
        (8L, 1000L, base.getTime * 1000),
        (8L, 1001L, base.getTime * 1000 + 300L * 1000000), // exactly +300s
        (8L, 1002L, base.getTime * 1000 + 300L * 1000000 + 1000), // +300s + 1ms
        (9L, 2000L, base.getTime * 1000),
        (9L, 2001L, base.getTime * 1000))) // same-ts pair: excluded
      .map { case (u, id, us) => (u, id, new java.sql.Timestamp(us / 1000)) }
    // millisecond-precision fixture is fine; re-derive exact micros in df
    val df = rows.toDF("user_id", "event_id", "ts")

    val got = RangeJoin.pairs(df, "user_id", "ts", "event_id", windowSec = 300)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = df.as("a").join(df.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("b.ts") > col("a.ts") &&
          col("b.ts") <= col("a.ts") + expr("INTERVAL 5 MINUTES"))
      .select(col("a.event_id"), col("b.event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive)
    assert(got.contains((1000L, 1001L)), "inclusive +300s boundary")
    assert(!got.exists(p => p._1 == 1000L && p._2 == 1002L), "exclusive beyond window")
    assert(!got.exists(p => p._1 == 2000L || p._1 == 2001L), "same-ts pairs excluded")

    // the plan must be a bucket-local equi join, never a per-key
    // nested-loop: no BroadcastNestedLoopJoin / CartesianProduct
    val plan = RangeJoin.pairs(df, "user_id", "ts", "event_id", 300)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must stay an equi join:\n$plan")
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
