package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** DSIR — Data Selection via Importance Resampling (public: Xie et al.
  * 2023, arXiv:2302.03169): estimate a target ("curated") and a raw
  * n-gram distribution over HASHED feature buckets, weight every raw
  * document by its log importance ratio
  * log w(x) = sum over gram instances g in x of
  *            [ln p_target(bucket(g)) - ln p_raw(bucket(g))],
  * and keep the top-weighted docs. The paper resamples with Gumbel
  * noise; the gated variant is the deterministic top-n by weight (the
  * seeded-noise path is a trivial score perturbation on top and would
  * make the oracle chase RNG streams instead of the estimator).
  *
  * Features are unigrams + bigrams hashed into `buckets` buckets via a
  * PORTABLE hash (first 8 hex digits of md5, mod buckets) so an
  * independent engine can recompute every bucket id exactly. Bucket
  * probabilities use add-alpha smoothing over the full bucket space.
  *
  * Scale shape: the model side collapses to one `buckets`-row table
  * (log-ratio per bucket) — broadcast. The corpus side is one scan into
  * a (doc, bucket)-keyed tf aggregation (map-side partial), a broadcast
  * join against the ratio table, and a doc-keyed exact decimal sum.
  * Top-n is TakeOrderedAndProject (no global sort); per-bucket
  * log-ratios round to 6 places before the decimal tf-weighted sum so
  * weights are aggregation-order-independent. */
object Dsir {

  val Buckets = 4096
  val Alpha = 0.5

  /** One row per gram INSTANCE: (id, carried..., bucket). Never
    * aggregated at (doc, bucket) width — both consumers below reduce it
    * map-side to something tiny before any exchange. */
  private def gramBuckets(docs: DataFrame, idCol: String, textCol: String,
                          buckets: Int, carry: Seq[String]): DataFrame = {
    val toks = filter(
      split(TextAnalysis.normText(lower(col(textCol))), " "),
      x => x =!= "")
    docs.select((idCol +: carry).map(col) :+ toks.as("t"): _*)
      .select((idCol +: carry).map(col) :+ explode(concat(col("t"),
        when(size(col("t")) >= 2, expr(
          "transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i + 1]))"))
          .otherwise(array()))).as("g"): _*)
      .withColumn("bucket",
        conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long") % buckets)
      .drop("g")
  }

  /** (id, bucket, tf): hashed unigram+bigram bag per document (the
    * explicit feature matrix — spec/diagnostic surface; [[select]] never
    * materializes this shape). */
  def bucketTf(docs: DataFrame, idCol: String, textCol: String,
               buckets: Int = Buckets): DataFrame =
    gramBuckets(docs, idCol, textCol, buckets, Seq.empty)
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("tf"))

  /** Select the top-n docs by DSIR importance weight. `isTarget` marks
    * the curated slice (evaluated against `docs` columns). Output:
    * (id, n_feats, logw, rank), rank 1..n by (logw DESC, id).
    *
    * Two linear passes over the gram stream, neither shuffling at gram
    * width: (1) bucket statistics collapse map-side to `buckets` rows
    * per partition before a `buckets`-row exchange; (2) weights join the
    * gram stream against the broadcast log-ratio table and reduce
    * doc-keyed (map-side partial). The (doc, bucket) feature matrix is
    * never materialized or shuffled. */
  def select(docs: DataFrame, isTarget: Column, n: Int,
             idCol: String = "doc_id", textCol: String = "text",
             buckets: Int = Buckets, alpha: Double = Alpha): DataFrame = {
    require(!docs.columns.contains("__graft_t"),
      "input must not already contain the scratch column __graft_t")
    val grams = gramBuckets(docs.withColumn("__graft_t", isTarget),
      idCol, textCol, buckets, Seq("__graft_t"))

    val cnt = grams.groupBy(col("bucket")).agg(
      count(lit(1)).as("cr"),
      sum(when(col("__graft_t"), 1L).otherwise(0L)).as("ct"))
    val totals = cnt.agg(sum(col("cr")).cast("double").as("crtot"),
      sum(col("ct")).cast("double").as("cttot"))

    val aB = alpha * buckets
    // With an empty target slice (zero target gram instances) or an
    // empty corpus (null sums), the importance ratio carries no signal —
    // the totals row is filtered away, so the result is empty rather
    // than a uniform-prior pseudo-ranking or null weights.
    val llr = cnt.crossJoin(broadcast(
        totals.filter(col("cttot") > 0 && col("crtot") > 0)))
      .select(col("bucket"),
        round(log((col("ct") + alpha) / (col("cttot") + aB)) -
              log((col("cr") + alpha) / (col("crtot") + aB)), 6)
          .cast(DecimalType(18, 6)).as("llr"))

    val weighted = grams.join(broadcast(llr), "bucket")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_feats"),
        round(sum(col("llr")).cast("double"), 4).as("logw"))

    import org.apache.spark.sql.expressions.Window
    val top = weighted.orderBy(col("logw").desc, col(idCol)).limit(n)
    // rank assigned inside the already-tiny top-n frame, so the global
    // ordering stays a TakeOrderedAndProject, never a full sort
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("logw").desc, col(idCol)))
          .cast("long"))
      .select(col(idCol), col("n_feats"), col("logw"), col("rank"))
  }
}
