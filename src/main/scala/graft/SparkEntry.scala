package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsQueries, ConverterQueries, LlmQueries, PipelineQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the beyond-reference
  * LLM-pipeline operators) registers a named query here plus, where the
  * semantics are ANSI-SQL-expressible, a DuckDB oracle statement over the
  * same parquet tables. Column names are aligned between the Spark plan and
  * the oracle SQL because the driver's compare sorts columns by name before
  * hashing.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    AnalyticsQueries.queries ++ ConverterQueries.queries ++ LlmQueries.queries ++
      PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    AnalyticsQueries.oracles ++ ConverterQueries.oracles ++ LlmQueries.oracles ++
      PipelineQueries.oracles

  /** Headline subset used by Bench (kept fast enough for per-round runs).
    * Covers every plan family for round-over-round regression tracking:
    * scans/aggs, joins (broadcast, as-of, range, bucketed co-located),
    * windows, pivot, streaming-equivalent, text, dedup, ANN, converters. */
  def benchQueries: Seq[String] = Seq(
    "q1_pricing_summary", "q3_top_unshipped_orders", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q7_window_top_orders", "q9_topk_orders",
    "q13_events_hourly",
    "q18_large_orders",
    "q23_asof_clicks", "q25_range_join_pairs", "q26_pivot_events",
    "q28_user_sessions", "pipeline_split",
    "stream_hourly_agg", "conv_stream_orc",
    "text_stats", "text_bpe_tokens", "text_tfidf_top",
    "dedup_exact_docs", "dedup_minhash_full",
    "dedup_simhash_full", "dedup_clusters", "dedup_span_exact",
    "dedup_incremental", "profile_documents",
    "emb_cosine_topk", "ann_lsh_topk", "ann_ivf_topk",
    "multimodal_decode",
    "conv_csv_roundtrip", "conv_orc_roundtrip", "conv_lineitem_orc",
    "conv_bucketed_join")
}
