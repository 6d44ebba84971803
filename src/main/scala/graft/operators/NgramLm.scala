package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Bigram language-model perplexity scoring — the CCNet-style quality
  * filter (public: Wenzek et al. 2020 "CCNet: Extracting High Quality
  * Monolingual Datasets from Web Crawl Data" filters on KenLM
  * perplexity; Heafield 2011 for the KN estimator): train an
  * interpolated Kneser-Ney bigram LM on a curated reference slice, then
  * score every document by its mean per-token log-probability — low
  * scores (high perplexity) flag text unlike the reference corpus.
  *
  * Estimator (absolute discount D, interpolated KN — Chen & Goodman
  * 1998, eq. 4.25 at bigram order):
  *   P(w2|w1) = max(c(w1,w2) - D, 0)/c(w1)
  *            + D * N1+(w1,*)/c(w1) * Pcont(w2)
  *   Pcont(w2) = N1+(*,w2) / |distinct bigram types|
  * with c(w1) summed over training bigrams from w1 (so every history
  * distributes exactly unit mass). Score-time backoff for words the
  * training slice never saw is pinned: an unseen history scores its
  * successor by Pcont alone; an unseen successor gets
  * P_unk = 1/(2B) (half the smallest possible continuation mass, so
  * OOV is always strictly less probable than any seen continuation).
  *
  * Scale shape: the model is three aggregate tables over the CURATED
  * slice only (bigram counts, per-history stats, continuation counts) —
  * broadcast here (the gate model is tiny) and swappable for plain
  * shuffle hash joins when a production model outgrows broadcast (same
  * plan shape, AQE decides). The corpus side is one scan: bigram
  * instances join the broadcast model and reduce straight to one row
  * per doc (map-side partial) — the only exchange carries per-doc
  * partial sums, never the token stream. Per-bigram log-probs round to
  * 6 places BEFORE the
  * decimal tf-weighted sum, so results are independent of aggregation
  * order and bit-equal to a single-node replay.
  */
object NgramLm {

  val Discount = 0.75

  /** One row per bigram INSTANCE (id, w1, w2): adjacent pairs within a
    * doc under the corpus-wide tokenization; docs shorter than 2 tokens
    * contribute nothing. Never aggregated at (doc, bigram) width — both
    * consumers reduce it against broadcast sides before any exchange. */
  def bigramInstances(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = split(TextAnalysis.normText(lower(col(textCol))), " ")
    docs.select(col(idCol), toks.as("t"))
      .filter(size(col("t")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(0, size(t) - 2), i -> struct(t[i] AS w1, t[i + 1] AS w2))"))
        .as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
  }

  /** Per-doc (doc_id, w1, w2, tf) bigram bag (diagnostic surface). */
  def bigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    bigramInstances(docs, idCol, textCol)
      .groupBy(col(idCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("tf"))

  /** The trained model: (bigram counts, history stats, continuation
    * counts, total bigram types). */
  final case class Model(bigram: DataFrame, history: DataFrame,
                         continuation: DataFrame, types: DataFrame)

  /** Train on the given slice (typically the curated sources).
    *
    * NOT pinned (r18 measurement): localCheckpointing the bigram-count
    * table here nudged the kn_bigram SCALE probe's sf1 shuffle over the
    * 5 MB accounting floor (4.4 -> 5.0 MB) and tripped the gate's
    * shuffle-ratio ceiling, for a net local win under 0.4 s — the four
    * broadcast subtrees' shared exchange is already cheap enough. */
  def train(trainDocs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): Model = {
    val bg = bigramInstances(trainDocs, idCol, textCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val hist = bg.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1p"))
    val cont = bg.groupBy(col("w2")).agg(count(lit(1)).as("nc"))
    val types = bg.agg(count(lit(1)).cast("double").as("b_types"))
    Model(bg, hist, cont, types)
  }

  /** Score every document: (doc_id, n_bigrams, mean_logprob, ppl).
    * ppl = exp(-mean_logprob), rounded after the rounded mean, so it
    * adds no extra float-order sensitivity. */
  def score(docs: DataFrame, model: Model, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame =
    instanceLogProbs(docs, model, idCol, textCol)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("long").as("n_bigrams"),
        round(sum(col("lp").cast(DecimalType(18, 6)))
          .cast("double") / count(lit(1)), 4).as("mean_logprob"))
      .withColumn("ppl", round(exp(-col("mean_logprob")), 4))

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020, "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl
    * Data"): every scored document lands in its stratum's (typically
    * per-language) `head` / `middle` / `tail` perplexity tercile under
    * the curated-source LM — the published recipe for grading crawl
    * text by how much it resembles the clean corpus.
    *
    * Buckets compare the round-4 ppl against round-6 tercile cuts, so
    * the assignment is engine-replayable (the q21/dataset-card gates pin
    * Spark `percentile` == DuckDB `quantile_cont`; rounding both sides
    * kills last-ulp interpolation drift). The cuts frame collapses to
    * #strata rows and broadcasts — the corpus is never reshuffled beyond
    * [[score]]'s own exchanges. Docs with fewer than two tokens have no
    * bigrams to score and are absent, as in [[score]].
    *
    * Output: (idCol, strataCol, ppl, bucket). */
  def pplBuckets(docs: DataFrame, model: Model, strataCol: String,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // localCheckpoint: the scored frame feeds BOTH the tercile-cuts
    // aggregate and the final join — without it the whole KN scoring
    // DAG (the expensive part) executes twice
    val scored = score(docs, model, idCol, textCol)
      .join(docs.select(col(idCol), col(strataCol)), Seq(idCol))
      .localCheckpoint()
    val cuts = scored.groupBy(col(strataCol)).agg(
      round(expr("percentile(ppl, 0.3333333333333333)"), 6).as("t1"),
      round(expr("percentile(ppl, 0.6666666666666666)"), 6).as("t2"))
    scored.join(broadcast(cuts), Seq(strataCol))
      .select(col(idCol), col(strataCol), col("ppl"),
        when(col("ppl") <= col("t1"), "head")
          .when(col("ppl") <= col("t2"), "middle")
          .otherwise("tail").as("bucket"))
  }

  /** Per-instance rounded log-probs (id, lp = round(ln p, 6)) — the
    * shared scoring core of [[score]] and [[minKProb]].
    *
    * An empty model (zero training bigram types) can score nothing:
    * every probability would be a division by zero. The types frame is
    * filtered to b_types > 0, so an empty model yields an empty result
    * (correct schema) instead of NaN/Infinity rows — no driver-side
    * probe needed, the guard lives in the plan.
    *
    * Per-INSTANCE scoring against the broadcast model — the bigram
    * stream never shuffles at (doc, bigram) width (a tf pre-aggregation
    * would exchange the whole token stream; downstream decimal sums are
    * identical either way since tf * r6(ln p) is just r6(ln p) added tf
    * times, exactly). */
  private def instanceLogProbs(docs: DataFrame, model: Model,
                               idCol: String, textCol: String): DataFrame = {
    val d = lit(Discount)
    val types = model.types.filter(col("b_types") > 0)
    val inst = bigramInstances(docs, idCol, textCol)
    val pCont: Column = col("nc") / col("b_types")
    val pUnk: Column = lit(1.0) / (lit(2.0) * col("b_types"))
    val pSucc: Column = when(col("nc").isNotNull, pCont).otherwise(pUnk)
    val p: Column = when(col("c1").isNotNull,
      greatest(coalesce(col("c12"), lit(0L)) - d, lit(0.0)) / col("c1") +
        d * col("n1p") / col("c1") * pSucc)
      .otherwise(pSucc)
    inst.join(broadcast(model.bigram), Seq("w1", "w2"), "left")
      .join(broadcast(model.history), Seq("w1"), "left")
      .join(broadcast(model.continuation), Seq("w2"), "left")
      .crossJoin(broadcast(types))
      .select(col(idCol), round(log(p), 6).as("lp"))
  }

  /** Min-K%-Prob membership signal (Shi et al., ICLR 2024): the mean of
    * each document's LOWEST k-fraction of per-bigram log-probs under the
    * model. Memorized/benchmark text lacks the surprising low-probability
    * tail ordinary prose has, so a HIGH min-k mean flags likely
    * training-set membership — the LM-side leg of contamination
    * detection beside the n-gram-overlap and embedding-overlap legs.
    *
    * Selection: instances at or below the doc's exact interpolated
    * k-quantile of rounded log-probs (ties inclusive — deterministic and
    * engine-replayable; with heavy ties the kept fraction can exceed k,
    * which both engines agree on). Two doc-keyed exchanges (quantile,
    * then the co-partitioned rejoin); per-doc state is bounded by doc
    * length. Output: (id, n_bigrams, n_low, min_k_mean). */
  def minKProb(docs: DataFrame, model: Model, k: Double = 0.2,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k > 0.0 && k <= 1.0, s"k in (0, 1], got $k")
    // localCheckpoint (r18, guide §1.2 — same rationale as pplBuckets'
    // scored frame): lp feeds BOTH the quantile aggregate and the rejoin
    // below, and their differently-shaped subtrees defeat exchange
    // reuse, so without the pin the KN scoring DAG (corpus scan, bigram
    // explode, four model joins) executes twice per call. The pinned
    // frame is two scalars per bigram instance — far smaller than the
    // token stream it derives from.
    val lp = instanceLogProbs(docs, model, idCol, textCol).localCheckpoint()
    // the threshold rounds to the lp grid (6dp) before the tie-inclusive
    // compare: engines interpolate quantiles with algebraically equal but
    // ulp-different formulas (a + f*(b-a) vs (1-f)*a + f*b), and an ulp
    // below a tied boundary value would flip every tie out of the kept
    // set on one engine only
    val thr = lp.groupBy(col(idCol))
      .agg(round(expr(s"percentile(lp, $k)"), 6).as("thr"),
        count(lit(1)).as("n_bigrams"))
    lp.join(thr, Seq(idCol))
      .filter(col("lp") <= col("thr"))
      .groupBy(col(idCol))
      .agg(first(col("n_bigrams")).as("n_bigrams"),
        count(lit(1)).as("n_low"),
        round(sum(col("lp").cast(DecimalType(18, 6)))
          .cast("double") / count(lit(1)), 4).as("min_k_mean"))
  }
}
