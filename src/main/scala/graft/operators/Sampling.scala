package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for data-mixing recipes.
  *
  * Random `sample()` is neither reproducible across runs/cluster sizes nor
  * auditable; training-data mixing needs BOTH. Selection here is a pure
  * function of the row content: a 16-bit bucket from the md5 hex prefix,
  * kept when lexicographically below the stratum's rate threshold. The
  * same document is therefore in or out of the mix on 1 executor or
  * 1000, and any engine with md5 (DuckDB, Trino, ...) reproduces the
  * exact sample — which is how the correctness gate verifies it.
  *
  * Zero shuffle: the filter is a per-row expression fused into the scan.
  */
object Sampling {

  /** 16-bit content bucket as 4 lowercase hex chars. */
  def hashBucketHex(c: Column): Column = substring(md5(c), 1, 4)

  /** Threshold string such that `bucket < threshold` keeps ~rate of rows
    * (exactly floor(rate * 65536) of the 65536 buckets). Rate 1.0 uses a
    * sentinel above every hex digit so all rows pass. */
  def thresholdHex(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    if (rate >= 1.0) "g" else f"${math.floor(rate * 65536).toInt}%04x"
  }

  /** Keep each row of stratum `strataCol` with its stratum's rate
    * (`defaultRate` for unlisted strata), deciding by the content hash of
    * `hashOn` — deterministic, partitioning-independent, SQL-mirrorable. */
  def stratifiedSample(df: DataFrame, strataCol: String, hashOn: Column,
                       rates: Map[String, Double],
                       defaultRate: Double): DataFrame = {
    val threshold = rates.foldLeft(lit(thresholdHex(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit(thresholdHex(rate))).otherwise(acc)
    }
    df.filter(hashBucketHex(hashOn) < threshold)
  }

  /** Deterministic train/validation/test assignment: adds `split` from the
    * content-hash bucket of `hashOn`, cutting the 65536 buckets at
    * floor(trainFrac*65536) and floor((trainFrac+valFrac)*65536). The same
    * row lands in the same split on any cluster size, any run, any engine
    * with md5 — the reproducibility/leakage-audit contract a training
    * pipeline needs (a `sample()`-based split silently reshuffles examples
    * between train and test across runs). Zero shuffle: one per-row
    * expression fused into the scan. */
  def trainValTestSplit(df: DataFrame, hashOn: Column,
                        trainFrac: Double, valFrac: Double): DataFrame = {
    require(trainFrac >= 0 && valFrac >= 0 && trainFrac + valFrac <= 1.0,
      s"fractions must be non-negative with trainFrac+valFrac <= 1, " +
        s"got $trainFrac/$valFrac")
    val b = hashBucketHex(hashOn)
    df.withColumn("split",
      when(b < lit(thresholdHex(trainFrac)), "train")
        .when(b < lit(thresholdHex(trainFrac + valFrac)), "val")
        .otherwise("test"))
  }
}
