package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus-trained quality classifier for training-data curation — the
  * GPT-3 recipe (Brown et al. 2020, Appendix A): score every crawl
  * document by a classifier trained to separate a small curated seed
  * (positive class: WebText/books/Wikipedia there; a designated source
  * set here) from the raw crawl, then keep high-scoring documents.
  *
  * The classifier is binary Naive Bayes over unigrams with Laplace
  * smoothing — deterministic, engine-portable arithmetic (no gradient
  * fit), so the full train + score pipeline is SQL-mirrorable and the
  * correctness gate recomputes every score from scratch in DuckDB.
  *
  * Per-token weight (shared vocabulary V = distinct corpus terms):
  *   logodds(t) = ln((cf_pos(t)+1) / (total_pos+V))
  *              - ln((cf_neg(t)+1) / (total_neg+V))
  * Document score = tf-weighted mean of its tokens' log-odds. Per-token
  * log-odds are rounded to 6 places BEFORE the exact decimal tf-weighted
  * sum, so the per-doc aggregate is order-independent and engine-identical
  * (the raw double sum would drift with aggregation order) — the same
  * construction as the unigram-LM score gate.
  *
  * Scale shape (100 TB corpus): training is one explode + term-keyed
  * partial agg (map-side combine; the shuffle carries one row per distinct
  * (doc,term) then per term). The trained table is vocabulary-sized —
  * sublinear in corpus size (Heaps' law) and broadcast to the scoring
  * join, so scoring never shuffles the corpus; the only doc-keyed exchange
  * carries (doc_id, tf, logodds) scalars.
  */
object QualityClassifier {

  private def toks(docs: DataFrame, idCol: String, textCol: String,
                   positive: Column): DataFrame =
    docs.select(col(idCol).as("doc_id"), positive.as("pos"),
        explode(split(TextAnalysis.normText(lower(col(textCol))), " ")).as("term"))
      .filter(col("term") =!= "")

  /** Trained per-token table: (term, cf_pos, cf_neg, logodds), logodds
    * rounded to 6 places (the scoring precision contract). `positive`
    * labels the curated seed rows, e.g. `col("source").isin("src0")`. */
  def tokenLogOdds(docs: DataFrame, idCol: String, textCol: String,
                   positive: Column): DataFrame = {
    val tf = toks(docs, idCol, textCol, positive)
      .groupBy(col("term"))
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("cf_pos"),
        sum(when(col("pos"), 0L).otherwise(1L)).as("cf_neg"))
    // three scalars (class totals + vocabulary size) in one tiny 1-row side
    val totals = tf.agg(sum(col("cf_pos")).as("tot_pos"),
      sum(col("cf_neg")).as("tot_neg"), count(lit(1)).as("vocab"))
    tf.crossJoin(broadcast(totals))
      .select(col("term"), col("cf_pos"), col("cf_neg"),
        round(
          log((col("cf_pos") + 1) / (col("tot_pos") + col("vocab")))
            - log((col("cf_neg") + 1) / (col("tot_neg") + col("vocab"))),
          6).as("logodds"))
  }

  /** Per-document quality score: (doc_id, n_tokens, score, keep) where
    * score is the tf-weighted mean token log-odds (rounded to 4) and
    * keep = score > threshold. Documents with no tokens are dropped (no
    * evidence either way — and the mean would be 0/0). */
  def score(docs: DataFrame, idCol: String, textCol: String,
            positive: Column, threshold: Double = 0.0): DataFrame = {
    val table = tokenLogOdds(docs, idCol, textCol, positive)
      .select(col("term"), col("logodds"))
    // Per-INSTANCE scoring against the broadcast log-odds table, reduced
    // straight to one row per doc (map-side partial): the token stream
    // never shuffles at (doc, term) width, and decimal sums commute over
    // tf multiplicity so the score is bit-identical to the tf-weighted
    // formulation the oracle replays.
    toks(docs, idCol, textCol, positive)
      .join(broadcast(table), "term")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        // + 0.0 canonicalizes IEEE -0.0 (a tiny negative mean rounds to
        // -0.0 here but can round to +0.0 in another engine — the value
        // compare is stringified, so the sign of zero must be pinned)
        (round(
          sum(col("logodds").cast(DecimalType(18, 6))).cast("double")
            / count(lit(1)), 4) + lit(0.0)).as("score"))
      .withColumn("keep", col("score") > threshold)
  }
}
