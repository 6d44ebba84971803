package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling: one output row per profiled column with row / null /
  * distinct counts and value bounds (bounds rendered as strings so the
  * output schema is independent of the profiled column types) — the
  * data-quality snapshot a pipeline takes before and after every
  * transform stage.
  *
  * Scale design: all per-column aggregates are computed in ONE
  * `Aggregate` over the table (a single scan, no per-column jobs or
  * driver loops); the one-row result is then unpivoted driver-free with
  * an `explode` of per-column structs. `exact` uses `count_distinct`,
  * which Spark plans via Expand into a two-phase aggregate — exact but
  * the shuffle carries one stream per distinct aggregate. `approx` swaps
  * in HLL++ `approx_count_distinct` (one ordinary partial-agg pass,
  * fixed-size sketch per column), the right profile for a 100 TB table
  * where ±2 % on cardinality is fine.
  */
object Profile {

  /** Exact per-column profile of `cols`. Output:
    * (col_name, n_rows, n_nulls, n_distinct, min_v, max_v). */
  def exact(df: DataFrame, cols: Seq[String]): DataFrame =
    profile(df, cols, exactDistinct = true)

  /** Same shape with approximate distinct counts (HLL++). rsd defaults
    * to 0.02, NOT Spark's 0.05: the gate holds the estimate within 5%
    * of exact, and a 1-sigma excursion at rsd 0.05 already breaks that
    * (observed on doc_id at sf0.1) — 0.02 leaves 2.5 sigma of headroom
    * at a still-tiny sketch size. */
  def approx(df: DataFrame, cols: Seq[String], rsd: Double = 0.02): DataFrame =
    profile(df, cols, exactDistinct = false, rsd)

  private def profile(df: DataFrame, cols: Seq[String],
      exactDistinct: Boolean, rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in input: ${missing.mkString(", ")}")
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nn"),
        (if (exactDistinct) count_distinct(col(c))
         else approx_count_distinct(col(c), rsd)).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("col_name"), col(s"${c}__nn").as("nn"),
        col(s"${c}__nd").as("nd"), col(s"${c}__min").as("min_v"),
        col(s"${c}__max").as("max_v"))
    }
    one.select(col("n_rows"), explode(array(entries: _*)).as("p"))
      .select(col("p.col_name").as("col_name"), col("n_rows"),
        (col("n_rows") - col("p.nn")).as("n_nulls"),
        col("p.nd").as("n_distinct"), col("p.min_v"), col("p.max_v"))
  }

  /** Equi-width histogram of a numeric column — the distribution half of
    * the profile (bounds and cardinality say nothing about shape; a
    * histogram catches the bimodal/spiked distributions that break
    * assumptions downstream). Two scans (exact min/max, then the binned
    * count — both single Aggregates, no per-bin jobs); bin assignment is
    * the closed-form floor expression, engine-portable for the oracle.
    * Bins are [min + i*w, min + (i+1)*w) with w = (max-min)/bins; the
    * max value closes into the last bin (the standard convention).
    * Nulls are excluded. Degenerate min == max puts everything in bin 0.
    * Output: (bin, lo, hi, n) for every non-empty bin. */
  def histogram(df: DataFrame, c: String, bins: Int): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val mm = df.agg(min(col(c)).cast("double").as("mn"),
      max(col(c)).cast("double").as("mx")).head()
    require(!mm.isNullAt(0), s"histogram($c): no non-null values")
    val (mn, mx) = (mm.getDouble(0), mm.getDouble(1))
    val w = (mx - mn) / bins
    val bin =
      if (w == 0.0) lit(0L)
      else least(floor((col(c).cast("double") - mn) / w).cast("long"),
        lit(bins - 1L))
    df.filter(col(c).isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("bin"),
        round(lit(mn) + col("bin") * w, 4).as("lo"),
        round(lit(mn) + (col("bin") + 1) * w, 4).as("hi"),
        col("n"))
  }

  /** Mergeable (incremental) profile: every field is a monoid, so
    * per-shard / per-day profiles MERGE into the corpus profile with
    * [[mergeSketched]] instead of re-scanning 100 TB — the profile
    * refresh path for continuous ingestion. Counts sum; bounds carry in
    * merge-safe typed fields (numeric bounds as double, string bounds
    * as string — a lexicographic min over RENDERED numerics would rank
    * "10" < "9"); distinct cardinality carries as a DataSketches HLL
    * SKETCH (binary), which unions by per-register max. The count and
    * bound fields merge EXACTLY (pinned as hard equality in the gate);
    * the HLL estimate merges within the sketch's error band but is NOT
    * guaranteed bit-equal to the single-pass estimate — near the
    * coupon-set -> dense-HLL promotion threshold (~500 distinct at the
    * default lgK 12) different union orders can leave the sketch in
    * different modes with slightly different estimators, so the gate
    * pins agreement to 5%, not equality. One Aggregate scan per shard,
    * struct-explode unpivot, no driver loops.
    *
    * Columns must be int/long/string/binary (the types
    * `hll_sketch_agg` accepts). */
  def sketched(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in input: ${missing.mkString(", ")}")
    def isNum(c: String) =
      df.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nn"),
        hll_sketch_agg(col(c)).as(s"${c}__hll"),
        (if (isNum(c)) min(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"${c}__minn"),
        (if (isNum(c)) max(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"${c}__maxn"),
        (if (isNum(c)) lit(null).cast("string") else min(col(c)).cast("string"))
          .as(s"${c}__mins"),
        (if (isNum(c)) lit(null).cast("string") else max(col(c)).cast("string"))
          .as(s"${c}__maxs"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("col_name"), col(s"${c}__nn").as("nn"),
        col(s"${c}__hll").as("hll"),
        col(s"${c}__minn").as("min_num"), col(s"${c}__maxn").as("max_num"),
        col(s"${c}__mins").as("min_str"), col(s"${c}__maxs").as("max_str"))
    }
    one.select(col("n_rows"), explode(array(entries: _*)).as("p"))
      .select(col("p.col_name").as("col_name"), col("n_rows"),
        (col("n_rows") - col("p.nn")).as("n_nulls"), col("p.hll").as("hll"),
        col("p.min_num"), col("p.max_num"), col("p.min_str"), col("p.max_str"))
  }

  /** Merge per-shard [[sketched]] profiles: counts sum, bounds min/max,
    * HLL sketches union (per-register max). The merge itself is a tiny
    * #cols-row aggregation. */
  def mergeSketched(parts: Seq[DataFrame]): DataFrame = {
    require(parts.nonEmpty, "mergeSketched needs at least one part")
    parts.reduce(_ unionByName _)
      .groupBy(col("col_name"))
      .agg(sum(col("n_rows")).as("n_rows"), sum(col("n_nulls")).as("n_nulls"),
        hll_union_agg(col("hll")).as("hll"),
        min(col("min_num")).as("min_num"), max(col("max_num")).as("max_num"),
        min(col("min_str")).as("min_str"), max(col("max_str")).as("max_str"))
  }

  /** Render a [[sketched]]/[[mergeSketched]] profile to the readable
    * shape: estimated distinct count + string bounds. */
  def finalizeSketched(p: DataFrame): DataFrame =
    p.select(col("col_name"), col("n_rows"), col("n_nulls"),
      hll_sketch_estimate(col("hll")).as("n_distinct_est"),
      coalesce(col("min_str"), col("min_num").cast("string")).as("min_v"),
      coalesce(col("max_str"), col("max_num").cast("string")).as("max_v"))

  /** Pairwise Jensen-Shannon divergence (in nats) between the term
    * distributions of each stratum (source, snapshot, shard...) — the
    * drift monitor a continuously-ingesting corpus needs: JS is
    * symmetric, bounded by ln 2, and zero iff the distributions match,
    * so a new crawl snapshot whose divergence from the standing corpus
    * jumps is flagged before it trains anything.
    *
    * The support is restricted to the global top-`topTerms` terms
    * (count desc, term tiebreak — deterministic), which (a) bounds every
    * intermediate at #strata * topTerms rows regardless of corpus size,
    * the standard practice for drift monitors, and (b) lets the support
    * table broadcast. One corpus scan feeds a (stratum, term) count
    * whose shuffle is bounded by #strata * topTerms groups after
    * map-side combine; the pairwise join runs on the tiny dense grid.
    *
    * Determinism contract: per-term contributions round to 12dp and sum
    * as exact DECIMAL (order-independent), final divergence rounds to
    * 6dp — identical on any partitioning and bit-replayable by the
    * DuckDB oracle. */
  /** Estimated distinct-overlap between every pair of strata via THETA
    * sketches — the set-operation sketch: where HLL only unions, theta
    * intersects, so two slices' ~16 KB sketches answer "how many
    * distinct items do these sources share" without the corpus-scale
    * distinct-intersection join. One scan builds a sketch per stratum
    * (mergeable TypedImperativeAggregate partials — KBs across the
    * shuffle); the #strata compact sketches collect to the driver (a
    * BOUNDED collect, one row per stratum) and pairwise
    * intersection/union estimates re-parallelize as the result.
    *
    * Deterministic: a theta sketch retains the k smallest item hashes —
    * a set property — so sketches and every derived estimate are
    * identical on any partitioning. `hashCol` must be a LongType item
    * hash (e.g. xxhash64 of the item).
    * Output: (a, b, est_a, est_b, est_inter, est_union) per pair a < b. */
  /** Pre-join key-skew audit: the distribution shape of per-key row
    * counts — the number every salting/AQE-skew decision starts from.
    * One map-side-combined count aggregation (the counts frame is
    * keys-sized), one single-row stats aggregate, and a topN heavy-key
    * probe via TakeOrderedAndProject; the final window runs on the
    * LIMITed topN rows only. Exact percentiles for oracle parity —
    * swap `percentile` for `approx_percentile` at 100 TB key counts.
    *
    * Output: topN rows (rk, key, cnt) each carrying the global stats
    * (n_keys, n_rows, p50_cnt, p99_cnt, skew_ratio = max/p50). */
  def keySkew(df: DataFrame, keyCol: String, topN: Int = 5): DataFrame = {
    require(topN >= 1, s"topN >= 1, got $topN")
    // integral keys only: a string key would silently cast("long") to
    // null and collapse every row into one bogus group (the ewmaByKey
    // lesson — validate up front, fail loudly)
    val kt = df.schema(keyCol).dataType
    require(kt.isInstanceOf[org.apache.spark.sql.types.ByteType] ||
        kt.isInstanceOf[org.apache.spark.sql.types.ShortType] ||
        kt.isInstanceOf[org.apache.spark.sql.types.IntegerType] ||
        kt.isInstanceOf[org.apache.spark.sql.types.LongType],
      s"keySkew: column '$keyCol' must be integral, got ${kt.simpleString} " +
        "— hash non-integral keys (xxhash64) first")
    val counts = df.groupBy(col(keyCol).cast("long").as("key"))
      .agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(
      count(lit(1)).as("n_keys"), sum(col("cnt")).as("n_rows"),
      max(col("cnt")).as("max_cnt"),
      expr("percentile(cnt, 0.5)").as("p50_raw"),
      expr("percentile(cnt, 0.99)").as("p99_raw"))
    val top = counts.orderBy(col("cnt").desc, col("key")).limit(topN)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("key"))).cast("long"))
    top.crossJoin(broadcast(stats))
      .select(col("rk"), col("key"), col("cnt"),
        col("n_keys"), col("n_rows"),
        round(col("p50_raw"), 4).as("p50_cnt"),
        round(col("p99_raw"), 4).as("p99_cnt"),
        round(col("max_cnt") / col("p50_raw"), 4).as("skew_ratio"))
  }

  def thetaOverlap(df: DataFrame, groupCol: String, hashCol: String,
                   lgK: Int = 12, maxGroups: Int = 256): DataFrame = {
    import graft.functions.ThetaSketchAgg
    require(maxGroups >= 2, s"maxGroups must be >= 2, got $maxGroups")
    val spark = df.sparkSession
    import spark.implicits._
    // Bounded-collect guard (same pattern as cosineNearDupPairs): the
    // per-group sketches collect to the driver and the pair grid is
    // O(G^2), sized for per-SOURCE use (dozens of groups). A caller
    // passing a high-cardinality group column gets this loud dial
    // error instead of a silent driver blowup.
    val probe = df.select(col(groupCol).cast("string").as("g"))
      .distinct().limit(maxGroups + 1).count()
    require(probe <= maxGroups,
      s"thetaOverlap is a driver-side O(G^2) pair grid over per-group " +
        s"sketches; '$groupCol' has more than maxGroups=$maxGroups groups. " +
        "Pre-bucket the group column (or raise maxGroups deliberately) — " +
        "a high-cardinality overlap matrix needs a distributed pair join, " +
        "not this per-source profile.")
    val sketches = df.groupBy(col(groupCol).cast("string").as("g"))
      .agg(ThetaSketchAgg.thetaSketch(col(hashCol), lgK).as("sk"))
      .collect()
      .map(r => (r.getString(0), r.getAs[Array[Byte]](1)))
      .sortBy(_._1)
    val pairs = for {
      i <- sketches.indices; j <- (i + 1) until sketches.length
      (ga, sa) = sketches(i); (gb, sb) = sketches(j)
    } yield (ga, gb,
      ThetaSketchAgg.estimate(sa), ThetaSketchAgg.estimate(sb),
      ThetaSketchAgg.intersectionEstimate(sa, sb, lgK),
      ThetaSketchAgg.unionEstimate(sa, sb, lgK))
    pairs.toSeq.toDF("a", "b", "est_a", "est_b", "est_inter", "est_union")
  }

  def termDivergence(df: DataFrame, strataCol: String, textCol: String,
                     topTerms: Int): DataFrame = {
    require(topTerms >= 1, s"topTerms must be >= 1, got $topTerms")
    val toks = split(TextAnalysis.normText(lower(col(textCol))), " ")
    val terms = df.select(col(strataCol).as("src"), explode(toks).as("term"))
      .filter(length(col("term")) >= 3)
    val support = terms.groupBy(col("term")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term")).limit(topTerms).select(col("term"))
    val counts = terms.join(broadcast(support), Seq("term"))
      .groupBy(col("src"), col("term")).agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col("src")).agg(sum(col("c")).as("tot"))
    val grid = totals.crossJoin(broadcast(support))
      .join(counts, Seq("src", "term"), "left_outer")
      .select(col("src"), col("term"),
        (coalesce(col("c"), lit(0L)).cast("double") / col("tot").cast("double")).as("p"))
    val a = grid.select(col("src").as("src_a"), col("term"), col("p").as("pa"))
    val b = grid.select(col("src").as("src_b"), col("term"), col("p").as("pb"))
    val m = col("pa") + col("pb")
    val contrib =
      (when(col("pa") > 0, col("pa") * log(lit(2.0) * col("pa") / m)).otherwise(lit(0.0)) +
       when(col("pb") > 0, col("pb") * log(lit(2.0) * col("pb") / m)).otherwise(lit(0.0))) * lit(0.5)
    a.join(b, Seq("term")).filter(col("src_a") < col("src_b"))
      .withColumn("ct", round(contrib, 12).cast("decimal(28,12)"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(round(sum(col("ct")), 6).cast("double").as("js"))
  }

  /** Two-sample Kolmogorov-Smirnov statistic from a merged per-value
    * count frame `u` with columns (q, c1, c2): ECDFs from cumulative
    * exact-integer fractions, D = max |F1 - F2| with the smallest
    * achieving q as witness. One row: (ks_d rounded 6dp, argmax_q).
    *
    * The unpartitioned windows run over `u` — the DISTINCT-VALUE grid,
    * which callers keep bounded by construction (e.g. 4dp scores in
    * [0,1] have at most 10001 distinct values regardless of corpus
    * size). Shared by the batch drift gate (`profile_ks_drift`) and the
    * streaming per-ingest-batch monitor
    * ([[graft.streaming.EventStream.qualityDriftApply]]). */
  def ksStatistic(u: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wq = Window.orderBy(col("q"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wPick = Window.orderBy(col("diff").desc, col("q"))
    u.withColumn("f1", sum(col("c1")).over(wq) / sum(col("c1")).over(wAll))
      .withColumn("f2", sum(col("c2")).over(wq) / sum(col("c2")).over(wAll))
      .withColumn("diff", abs(col("f1") - col("f2")))
      .withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .select(round(col("diff"), 6).as("ks_d"), col("q").as("argmax_q"))
  }
}
