package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hash-partitioned joins and aggregations.
  *
  * At 100 TB a handful of hot keys (one user with 10^9 events, the empty
  * string, a null-ish sentinel) turn a clean shuffle into one straggler
  * task. Two standard remedies, both pure DataFrame transforms:
  *
  *  - [[saltedJoin]]: explode the *small* side into `salts` replicas keyed
  *    (key, salt), scatter the big side by (key, random-but-deterministic
  *    salt), join on the composite key. Hot keys spread over `salts` tasks.
  *    Complements AQE's skew-join splitting (enabled in the session
  *    builders), which handles moderate skew automatically; salting is the
  *    explicit tool for pathological keys.
  *
  *  - [[saltedAggregate]]: two-phase aggregation — partial aggregate on
  *    (key, salt), then final aggregate on key. The classic fix when even
  *    map-side combine leaves one reducer hot.
  *
  * Determinism: the salt is `pmod(xxhash64(row identity cols), salts)` —
  * a pure function of the row, so results are reproducible across runs,
  * partitionings, and cluster sizes (unlike `rand()`-based salting).
  */
object SkewJoin {

  /** Join `big` (skewed) with `small` on `key`, spreading each big-side
    * key over `salts` partitions. `bigSaltSource` must be a column of the
    * big side that varies within a key (e.g. a row id) so rows of a hot
    * key land in different buckets. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 bigSaltSource: Column, salts: Int): DataFrame = {
    val salted = big.withColumn("__salt", pmod(xxhash64(bigSaltSource), lit(salts)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase aggregation: count + exact decimal sum per key with the
    * heavy shuffle split over (key, salt) first. */
  def saltedCountSum(df: DataFrame, key: String, valueCol: Column,
                     saltSource: Column, salts: Int): DataFrame = {
    import graft.Tables.dec
    df.withColumn("__salt", pmod(xxhash64(saltSource), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(dec(valueCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).cast("double").as("sum_value"))
  }
}
