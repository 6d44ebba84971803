package graft

import org.scalatest.funsuite.AnyFunSuite

/** CI-enforced plan-shape invariants — the assertion form of the
  * `Explain` audit set, so a plan regression (a lost pushdown, a join
  * degrading to a nested-loop, a global window sneaking in before a
  * top-k) fails `sbt test` instead of waiting for a human to reread the
  * formatted plans.
  *
  * Plans are built lazily at sf0.001 (no execution beyond what the query
  * constructors themselves stage), from the initial physical plan — AQE
  * only ever REPLACES exchanges/joins with cheaper runtime choices, so
  * asserting on the static plan is the conservative check.
  */
class PlanAuditSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  /** Queries whose ONLY nested-loop joins are intentional broadcasts of
    * one-row/stat/query frames (bench-query broadcast in ANN brute-force
    * verdicts, corpus-stat frames in scoring/selection). Everything else
    * must plan zero nested-loop joins. */
  private val statCrossJoinAllowed = Set(
    "ann_lsh_topk", "ann_rp_topk", "q38_user_similarity",
    "text_bm25_serve", "pipeline_dsir_select", "text_min_k_prob",
    // radius search broadcasts the (bounded) query frame against the
    // corpus scan — the same intended shape as the ANN brute-force legs
    "emb_cosine_radius", "ann_ivf_radius",
    // truncated-dim funnel: prefix brute-force shortlist + exact re-rank
    // both broadcast the bounded query frame
    "ann_truncated_topk",
    // the refine gate's VERDICT side is brute-force exact top-k, which
    // broadcasts the bounded query frame like the other ANN verdicts
    "ann_ivf_pq_refine",
    // the KN scorer's broadcast one-row bigram-types frame (the same
    // crossJoin text_min_k_prob carries) reached through pplBuckets
    "pipeline_ppl_buckets",
    // bitext mining broadcasts the bounded target-side frame against the
    // bounded source side — the gate-sized exact formulation (the scale
    // path swaps in an IVF/LSH shortlist, see Similarity.marginPairs)
    "emb_bitext_margin",
    // vocab coverage broadcasts the 1-row corpus-total frame against the
    // top-k terms (the text_tfidf_top pattern); collocations likewise
    // broadcast their two 1-row totals
    "text_vocab_coverage", "text_collocations",
    // the DSv2 gate crossJoins the broadcast 1-row versionAsOf(0)
    // aggregate onto the 1-row latest aggregate
    "conv_table_dsv2")

  private val audited = Seq(
    "q1_pricing_summary", "q3_top_unshipped_orders", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q25_range_join_pairs",
    "dedup_minhash_full", "dedup_ngram_jaccard", "dedup_fuzzy_names",
    "ann_lsh_topk", "ann_rp_topk",
    "q34_funnel_conversion", "q35_retention_cohorts", "q36_resample_ffill",
    "q37_outliers_mad", "q38_user_similarity", "q40_winsorize", "q42_ewma",
    "text_heavy_hitters", "text_bm25_serve", "dedup_incremental_serve",
    "pipeline_dsir_select", "text_min_k_prob",
    // r9 additions: C4 cleaning, entropy, NFC, ppl terciles, IR metrics,
    // cross-source matrix, pg_dump parse (constructing these only stages
    // their tiny sf0.001 fixtures)
    "text_c4_clean", "text_entropy", "text_normalize",
    "pipeline_ppl_buckets", "retrieval_metrics", "dedup_cross_source",
    "conv_pgdump_roundtrip",
    // r9 second batch: XML leg, schema-evolution union, radius search,
    // per-language calibration
    "conv_xml_roundtrip", "conv_schema_evolution",
    "emb_cosine_radius", "ann_ivf_radius", "pipeline_score_calibrate",
    // r10: URL curation family, universal-input legs, export symmetry
    // (constructing the converter gates stages/runs their tiny sf0.001
    // fixtures, same as the r9 converter entries)
    "text_url_canon", "dedup_url", "pipeline_cap_per_domain",
    "pipeline_url_blocklist",
    "conv_parquet_roundtrip", "conv_avro_roundtrip", "conv_dump_bz2",
    "conv_sqlitedump_roundtrip", "conv_export_dump", "conv_export_xml",
    // r10 second batch: fixed-width leg, jdbc/avro export, matryoshka
    // tier, audit operators
    "conv_fixedwidth_roundtrip", "conv_export_jdbc", "conv_export_avro",
    "ann_truncated_topk", "profile_zipf", "profile_k_anon",
    "pipeline_length_buckets",
    // r10 fourth batch: global-id assignment, Aho-Corasick scrub,
    // cluster assignment/balance, bitext margin mining
    "pipeline_global_ids", "text_keyword_scrub", "emb_cluster_assign",
    "pipeline_cluster_balance", "emb_bitext_margin",
    // r10 fifth batch (stream_minhash_ingest / multimodal decode gates
    // are eager — streaming index build, RDD-side codec work — and are
    // pinned by their specs + oracles instead)
    "text_readability",
    // r10 sixth batch: curriculum interleave, PMI table, KS drift
    "pipeline_curriculum", "profile_term_pmi", "profile_ks_drift",
    // r10 seventh batch: chat/SFT stats, embedding outlier audit
    "pipeline_chat_stats", "emb_outlier_flags",
    // r10 eighth batch: composed curation (streaming drift is eager),
    // vocabulary coverage curve
    "pipeline_curate_v2", "text_vocab_coverage", "emb_bitext_margin_engine",
    "conv_export_fixedwidth",
    // r10 eleventh batch: collocation mining, langid confusion matrix
    "text_collocations", "text_lang_confusion", "emb_dim_stats",
    "emb_whitening", "conv_csv_sniff",
    // r11: arbitrary-length substring dedup — equi-joins on the window
    // hash only, per-doc windows, no pair join anywhere
    "dedup_substring",
    // r11 second wave: iterative PageRank (hash equi-joins per
    // iteration, never nested-loop), the one-scan expectation suite,
    // the snapshot-table gates (manifest-planned scans + final aggs),
    // and PRF (eager two-round retrieval; its tiny result is local but
    // constructing it audits both rounds' shapes for free)
    "graph_pagerank", "profile_expectations", "conv_table_timetravel",
    "conv_table_prune", "conv_table_merge", "conv_table_changes",
    "retrieval_prf",
    // r13: the IVFADC refine funnel (probed-cell ADC scan + broadcast
    // shortlist re-rank — constructing it trains the tiny sf0.001
    // codebooks) and the many-files manifest scan (stages its 128-file
    // table once; the audited plan is the pruned scan + final agg).
    // dedup_fuzzy_names, already audited above, now exercises the
    // half-key partition join — the no-cartesian/no-BNLJ walk applies
    // to the new route for free.
    "ann_ivf_pq_refine", "conv_table_manyfiles",
    // r14: the DSv2 read path (manifest-planned scan + broadcast 1-row
    // v0 aggregate), the columnar-checkpoint replay scan, and the
    // restored-head scan — all must stay free of cartesians/BNLJ
    "conv_table_dsv2", "conv_table_ckpt_orc", "conv_table_restore",
    // r17 (VERDICT r16 #6): the four r16 table gates join the walkers —
    // exact tuple pruning, the storage-partitioned join pair (their
    // in-gate plan verdicts pin no-Exchange; here they additionally
    // prove no cartesian/BNLJ), MERGE-through-MOR and the MOR debt
    // lifecycle, plus this round's spec-evolution gate
    "conv_table_partition_prune", "conv_table_bucket_join",
    "conv_table_mor_merge", "conv_table_compact_mor",
    "conv_table_partition_evolve")

  /** Plans whose unpartitioned window is over a frame that is bounded BY
    * AGGREGATION rather than by a limit: GlobalIds' offsets prefix-sum
    * runs over one row per shuffle partition (a groupBy(partition_id)
    * count), never over corpus rows; the KS statistic's ECDF windows run
    * over the distinct-4dp-score aggregate (<= 10001 rows by value
    * range). The walker accepts an Aggregate beneath the window for
    * exactly these plans. */
  private val aggBoundedWindowAllowed =
    Set("pipeline_global_ids", "pipeline_curriculum", "profile_ks_drift",
      "pipeline_curate_v2")

  test("no audited plan contains a cartesian product") {
    audited.foreach { n =>
      assert(!plan(n).contains("CartesianProduct"),
        s"$n plans a CartesianProduct")
    }
  }

  test("nested-loop joins appear only in the intended broadcast-stat plans") {
    audited.filterNot(statCrossJoinAllowed).foreach { n =>
      assert(!plan(n).contains("BroadcastNestedLoopJoin"),
        s"$n plans a BroadcastNestedLoopJoin — a candidate join degraded " +
          "to all-pairs")
    }
  }

  test("pushdown-dependent serve plans keep their scan filters") {
    // BM25 serving reads the term-sorted index with the query terms
    // pushed into the ORC scan (stripe skipping = zero corpus bytes for
    // absent terms); losing the In(term,...) pushdown silently degrades
    // to a full index scan
    val bm25 = plan("text_bm25_serve")
    assert("PushedFilters: \\[[^\\]]*In\\(term".r.findFirstIn(bm25).isDefined,
      "text_bm25_serve lost the In(term,...) index pushdown")
    // incremental-dedup serving must keep a non-empty pushdown on the
    // standing index scan
    val inc = plan("dedup_incremental_serve")
    assert("PushedFilters: \\[[^\\]]+\\]".r.findFirstIn(inc).isDefined,
      "dedup_incremental_serve lost its index scan pushdown")
    // the flagship scan filter reaches the parquet reader
    assert(plan("q1_pricing_summary").contains("LessThanOrEqual(l_shipdate"),
      "q1 shipdate filter no longer pushed to the scan")
  }

  test("snapshot-table schema-pinned reads keep ORC filter pushdown") {
    // schema evolution pins the scan to an explicit merged schema
    // (spark.read.schema(...).orc) — that path must not cost the
    // filter/column pushdown a plain orc read gets
    import org.apache.spark.sql.functions.{col, lit}
    val dir = java.nio.file.Files.createTempDirectory("snapplan").toString
    val orders = Tables.t(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    graft.sinks.SnapshotTable.commit(spark, orders, dir, "overwrite")
    graft.sinks.SnapshotTable.commit(spark,
      orders.withColumn("extra", lit(1L)), dir, "append") // evolved: pinned path
    val p = graft.sinks.SnapshotTable.read(spark, dir)
      .filter(col("o_orderkey") === 42L)
      .select(col("o_orderkey"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("PushedFilters: \\[[^\\]]*EqualTo\\(o_orderkey".r.findFirstIn(p).isDefined,
      "schema-pinned snapshot read lost ORC filter pushdown")
    assert("ReadSchema: [^\\n]*o_orderkey".r.findFirstIn(p).isDefined &&
      !"ReadSchema: [^\\n]*o_totalprice".r.findFirstIn(p).isDefined,
      "schema-pinned snapshot read lost column pruning")
  }

  test("pruned range scans push BOTH range bounds into the ORC reader") {
    // the manifest stab skips whole files; the residual predicate must
    // still reach the reader as pushed range filters so per-stripe
    // min/max skips row groups INSIDE kept files. The naive
    // `col >= doubleLit` wraps an integral column in cast(col as
    // double), which pushes nothing but IsNotNull (r14 fix:
    // rangePredicate casts the literals, exactly, instead).
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("snapprune").toString
    graft.sinks.SnapshotTable.commit(spark,
      Tables.t(spark, sf, "orders").select(col("o_orderkey"))
        .repartitionByRange(4, col("o_orderkey")),
      dir, "overwrite", statsCols = Seq("o_orderkey"))
    val (df, _, _) = graft.sinks.SnapshotTable.scanPruned(spark, dir,
      "o_orderkey", 100.0, 200.0)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(o_orderkey,100"
      .r.findFirstIn(p).isDefined &&
      "LessThanOrEqual\\(o_orderkey,200".r.findFirstIn(p).isDefined,
      s"pruned scan lost ORC range pushdown")
  }

  test("top-k plans use TakeOrderedAndProject, not a global window") {
    for (n <- Seq("text_heavy_hitters", "dedup_minhash_full",
        "q3_top_unshipped_orders")) {
      val p = plan(n)
      assert(p.contains("TakeOrderedAndProject"),
        s"$n top-k no longer plans as TakeOrderedAndProject")
    }
  }

  test("every unpartitioned window sits above a bounded (top-k/limit) input") {
    // the r6 finding this guards against: a rank-over-empty-partition
    // window moving the FULL data set to one partition to compute a
    // global top-k. A global window over an already-limited frame (e.g.
    // a share-of-total over the 25 heavy hitters) is fine — so the
    // invariant is on the tree: an empty partitionSpec WindowExec must
    // have a TakeOrderedAndProject/limit somewhere beneath it.
    import org.apache.spark.sql.execution.{GlobalLimitExec, LocalLimitExec, TakeOrderedAndProjectExec}
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
    import org.apache.spark.sql.execution.window.WindowExec
    audited.foreach { n =>
      val sp = SparkEntry.queries(n)(spark, sf).queryExecution.sparkPlan
      sp.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
        .foreach { w =>
          val bounded = w.child.collectFirst {
            case t: TakeOrderedAndProjectExec => t
            case g: GlobalLimitExec => g
            case l: LocalLimitExec => l
            case a: HashAggregateExec if aggBoundedWindowAllowed(n) => a
            case a: ObjectHashAggregateExec if aggBoundedWindowAllowed(n) => a
            case a: SortAggregateExec if aggBoundedWindowAllowed(n) => a
          }
          assert(bounded.isDefined,
            s"$n plans a global (unpartitioned) window over UNBOUNDED " +
              "input — full-data single-partition sort")
        }
    }
  }
}
