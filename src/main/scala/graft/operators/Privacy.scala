package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Differentially-private statistics release — the publication step for
  * dataset cards and usage reports over corpora with per-user/source
  * sensitivity: per-group counts with Laplace noise at sensitivity 1
  * (Dwork et al. 2006), scale b = 1/epsilon.
  *
  * The noise draw is DETERMINISTIC: the uniform comes from a 52-bit
  * md5 of (group, seed) — the same engine-portable construction the
  * Efraimidis-Spirakis sampler uses — pushed through the Laplace
  * inverse CDF. That makes the release reproducible on any cluster AND
  * bit-replayable by the SQL oracle. Privacy accounting note: a fixed
  * seed is ONE release — re-running never spends additional budget;
  * rotating the seed is a new epsilon-expenditure. Plan shape: one
  * map-side-combined count aggregation over #groups rows, noise as
  * codegen'd Column arithmetic.
  */
object Privacy {

  /** (groupCol, n_true, dp_count): epsilon-DP noisy counts per group.
    * `n_true` is returned for VERIFICATION harnesses only — a real
    * release publishes `dp_count` alone. dp_count rounds 4dp. */
  def dpGroupCounts(df: DataFrame, groupCol: String, epsilon: Double,
                    seed: String): DataFrame = {
    require(epsilon > 0.0, s"epsilon must be positive, got $epsilon")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_true"))
    counts.select(col(groupCol), col("n_true"),
      round(col("n_true") + laplaceNoise(
        concat(col(groupCol).cast("string"), lit(":"), lit(seed)),
        1.0 / epsilon), 4).as("dp_count"))
  }

  /** Deterministic Laplace(b) draw from a content-seeded uniform:
    * u = (md5_52bit + 0.5) / 2^52 in (0,1), centered c = u - 0.5,
    * noise = -b * sign(c) * ln(1 - 2|c|). */
  def laplaceNoise(seedContent: Column, b: Double): Column = {
    val u = (conv(substring(md5(seedContent), 1, 13), 16, 10)
      .cast("double") + lit(0.5)) / lit(4503599627370496.0)
    val c = u - lit(0.5)
    lit(-b) * signum(c) * log(lit(1.0) - lit(2.0) * abs(c))
  }
}
