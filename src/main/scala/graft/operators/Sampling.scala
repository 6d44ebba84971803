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

  /** Greedy per-stratum token-budget fill — the data-mixing step that
    * caps each source at a target token count (training mixes are
    * specified in tokens, not documents: "x B tokens of source A, y B of
    * source B"). Rows in each stratum are ordered by content-hash bucket
    * (+ caller-supplied unique tie-break, so ties at the cutoff cannot
    * make the kept set order-dependent) and kept while the stratum's
    * cumulative token count BEFORE the row is inside its budget — i.e.
    * the greedy fill takes the first row that crosses the line and stops.
    * Hash ordering makes the fill a deterministic uniform sample of the
    * stratum, reproducible on any cluster size and in any engine with md5.
    *
    * Scale shape: ONE shuffle (the per-stratum window). Strata counts are
    * small (sources/domains), so per-partition work is bounded by stratum
    * size; a skewed giant stratum is the same skew a groupBy(source) has —
    * salt upstream if one source dominates. */
  def capTokenBudget(df: DataFrame, strataCol: String, tokensCol: Column,
                     hashOn: Column, tieBreak: Column,
                     budgets: Map[String, Long],
                     defaultBudget: Long): DataFrame = {
    require(defaultBudget >= 0 && budgets.values.forall(_ >= 0),
      "budgets must be non-negative")
    val budget = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (stratum, b)) =>
        when(col(strataCol) === stratum, lit(b)).otherwise(acc)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(hashBucketHex(hashOn), tieBreak)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("cum_tokens", sum(tokensCol.cast("long")).over(w))
      .filter(col("cum_tokens") - tokensCol.cast("long") < budget)
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

  /** Leakage-free train/val/test assignment: near-duplicate documents
    * land in the SAME split. A per-document hash split silently leaks —
    * a near-dup of a training doc assigned to test inflates every eval
    * on it (the contamination mechanism the decontamination operators
    * exist for, reproduced inside one's own corpus). The fix: hash the
    * near-dup CLUSTER's representative (component-min id over the dedup
    * pair graph; unpaired docs are their own representative), so whole
    * clusters move between splits as one unit. Composes with any pair
    * generator ([[Dedup.minhashVerifiedPairs]],
    * [[Dedup.ngramJaccardPairs]], the incremental funnel): pairs in,
    * per-doc split out.
    *
    * Scale shape: component labeling touches only PAIRED ids (the
    * labeling frame is near-dup-count sized, not corpus sized), one
    * equi-join hangs it back on the corpus, and the split itself is the
    * same per-row md5-bucket expression as [[trainValTestSplit]] on the
    * representative — engine-portable, cluster-size-independent. */
  /** TEMPORAL train/test split with an embargo gap — the third member
    * of the split family (content-hash [[trainValTestSplit]], cluster
    * [[leakFreeSplit]], and this): rows strictly before `trainEnd` are
    * `train`, rows at-or-after `testStart` are `test`, and rows inside
    * `[trainEnd, testStart)` are `embargo` — excluded from both so
    * leakage through temporally-adjacent examples (the forecasting /
    * time-series-CV failure mode; cf. purged CV, López de Prado 2018)
    * cannot cross the boundary. Zero shuffle: one per-row expression
    * fused into the scan; any ordered time column works. */
  def splitByTime(df: DataFrame, timeCol: Column,
                  trainEnd: Column, testStart: Column): DataFrame =
    df.withColumn("split",
      when(timeCol < trainEnd, "train")
        .when(timeCol >= testStart, "test")
        .otherwise("embargo"))

  def leakFreeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
                    trainFrac: Double, valFrac: Double): DataFrame = {
    val comps = Dedup.connectedComponents(pairs)
      .withColumnRenamed("id", "__lfs_id")
    val withRep = df
      .join(comps, df(idCol) === col("__lfs_id"), "left")
      .withColumn("__lfs_rep", coalesce(col("cluster_id"), col(idCol)))
    trainValTestSplit(withRep, col("__lfs_rep").cast("string"),
        trainFrac, valFrac)
      .drop("__lfs_id", "cluster_id", "__lfs_rep")
  }

  /** Temperature-scaled mixture sampling — the multilingual/multi-source
    * rebalancing recipe (mT5, PaLM: sample source s with probability
    * proportional to n_s^T, T in (0,1] flattening the source
    * distribution so big sources stop drowning small ones). Per-source
    * keep rates are DERIVED FROM THE DATA relationally:
    *
    *   rate_s = min(1, targetRows * p_s / n_s),  p_s = n_s^T / sum_t n_t^T
    *
    * then applied with the same per-row md5 content bucket as
    * [[stratifiedSample]] — deterministic, partitioning-invariant,
    * engine-replayable. The n_s^T terms round to 8dp and sum as exact
    * DECIMAL so the normalizer is identical regardless of partitioning
    * or engine (double summation order would drift in the last ulp);
    * everything after is fixed-association double arithmetic on
    * identical inputs.
    *
    * Scale shape: one tiny agg over the stratum column (map-side
    * combined to #sources rows), a broadcast of #sources rates back
    * onto the corpus, and a per-row scan filter — no corpus shuffle. */
  def temperatureSample(df: DataFrame, strataCol: String, hashOn: Column,
                        temperature: Double, targetRows: Long): DataFrame = {
    require(temperature > 0.0 && temperature <= 1.0,
      s"temperature must be in (0,1], got $temperature")
    require(targetRows >= 0L, s"targetRows must be >= 0, got $targetRows")
    val powed = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("__ts_n"))
      .withColumn("__ts_p",
        round(pow(col("__ts_n"), lit(temperature)), 8).cast("decimal(28,8)"))
    val tot = powed.agg(sum(col("__ts_p")).as("__ts_tot"))
    val rates = powed.crossJoin(tot)
      .withColumn("__ts_rate",
        least(lit(1.0),
          lit(targetRows.toDouble) * col("__ts_p").cast("double")
            / col("__ts_tot").cast("double") / col("__ts_n").cast("double")))
      .select(col(strataCol), floor(col("__ts_rate") * 65536).as("__ts_cut"))
    df.join(broadcast(rates), Seq(strataCol))
      .filter(conv(substring(md5(hashOn), 1, 4), 16, 10).cast("long") < col("__ts_cut"))
      .drop("__ts_cut")
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006,
    * "Weighted random sampling with a reservoir"): each row draws key
    * u^(1/w) — compared in log space as ln(u)/w, which orders
    * identically and never underflows — and the k LARGEST keys form
    * the sample, distributed exactly as k sequential weighted draws
    * without replacement. Quality- or length-proportional corpus
    * selection in one pass, no per-draw loop.
    *
    * u is a 52-bit uniform from the row's md5 content hash, so the
    * whole draw is a pure function of row content: deterministic across
    * runs and cluster sizes, auditable, and replayable in any engine
    * with md5 + ln — the gate's DuckDB oracle reruns the complete
    * trajectory. `tieBreak` must be row-unique so equal keys (e.g.
    * byte-identical rows) cannot make the kept set order-dependent.
    *
    * Scale shape: zero shuffle before the top-k, and the top-k plans as
    * TakeOrderedAndProject — every partition keeps its best k rows and
    * only n_partitions*k rows converge. Weights must be strictly
    * positive (ln(u) < 0, so w <= 0 would invert the order). */
  def weightedSample(df: DataFrame, hashOn: Column, weight: Column,
                     tieBreak: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    df.withColumn("__es_key", esKey(hashOn, weight))
      .orderBy(col("__es_key").desc, tieBreak)
      .limit(k)
      .drop("__es_key")
  }

  /** Per-stratum [[weightedSample]]: k independent weighted draws
    * without replacement WITHIN each stratum (source, domain, lang) in
    * one pass — the per-domain selection step of a mixing recipe
    * ("best k docs from every domain, length/quality-weighted"). Same
    * deterministic Efraimidis-Spirakis key; ONE shuffle (the
    * per-stratum window), and Spark plans the rank filter as a
    * WindowGroupLimit, pruning each partition to k rows per stratum
    * map-side before the exchange. */
  def weightedSamplePerStratum(df: DataFrame, strataCol: String,
      hashOn: Column, weight: Column, tieBreak: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(col("__es_key").desc, tieBreak)
    df.withColumn("__es_key", esKey(hashOn, weight))
      .withColumn("__es_rn", row_number().over(w))
      .filter(col("__es_rn") <= k)
      .drop("__es_key", "__es_rn")
  }

  /** The Efraimidis-Spirakis log-space draw key ln(u)/w, u a 52-bit md5
    * content uniform in (0,1). */
  private def esKey(hashOn: Column, weight: Column): Column = {
    val h = conv(substring(md5(hashOn), 1, 13), 16, 10).cast("double")
    val u = (h + lit(0.5)) / lit(4503599627370496.0) // (h+0.5)/2^52
    log(u) / weight
  }
}
