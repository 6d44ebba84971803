package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph centrality — the web-graph quality signal large-scale
  * pretraining pipelines attach to crawled documents (rank a page/domain by
  * the link structure, then weight or filter the corpus by it; cf. the
  * harmonic-centrality / PageRank selection in public CommonCrawl curation
  * write-ups). The reference engine has no graph operator; this is part of
  * the beyond-reference LLM-pipeline layer.
  *
  * Arithmetic contract — FIXED-POINT PageRank: ranks are BIGINT micro-units
  * (`scale` = total mass), every per-iteration step is integer `div`/`*`/`+`.
  * Rationale: float PageRank sums contributions in partition order, so a
  * 1000-executor run and the single-node oracle would drift in the last
  * ulps and hash-mismatch; integer sums commute exactly (same reason
  * [[graft.Tables.dsum]] sums DECIMAL). The floor losses (≤ outdeg per
  * node per iteration, ~1e-9 of total mass here) only shave dust off the
  * trailing digits — ranking order is unaffected at any realistic scale,
  * and the result is bit-identical on ANY partitioning, cluster size, or
  * AQE re-plan.
  *
  * Distributed shape: the edge list is the big side (100 TB corpus → O(doc
  * links) rows); it is hash-partitioned on `src` ONCE and persisted, and
  * every iteration reuses that layout for the rank join (Exchange reuse —
  * the rank table, O(nodes), is the only side that moves). Contributions
  * then shuffle once per iteration keyed by `dst` with map-side partial
  * sums. This is the standard Pregel-style plan: per iteration, one
  * node-table shuffle + one partially-aggregated contribution shuffle,
  * never an all-pairs or a driver-side loop over nodes. At production
  * iteration counts (>10), checkpoint `ranks` every few rounds to truncate
  * lineage; at the gate's 5 iterations the plan stays compact.
  */
object Graph {

  /** Fixed-point PageRank over an UNDIRECTED view of `edges` (each edge is
    * added in both directions, then deduped): with symmetric edges every
    * node has outdeg ≥ 1 and indeg ≥ 1, so there is no dangling-mass term
    * and the node set is stable across iterations — the right shape for
    * host/domain co-citation graphs, where "importance" should flow both
    * ways. Returns (node: long, rank_fp: long) where rank_fp is the rank
    * in `scale` units; initial mass is `scale div n` per node.
    *
    * r'(v) = teleport + damping * Σ_{u→v} (r(u) div outdeg(u)) div 100
    * with teleport = (100 - dampingPct) * (scale div n) div 100.
    */
  def pageRankFixedPoint(edges: DataFrame, srcCol: String, dstCol: String,
                         iters: Int = 5, scale: Long = 1000000000000L,
                         dampingPct: Int = 85): DataFrame = {
    require(iters >= 1 && dampingPct >= 0 && dampingPct <= 100)
    val dir = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    // Symmetric closure with ONE corpus exchange (r18, guide §2.4): the
    // union repartitions by src FIRST, so the dedup aggregate and the
    // outdeg count both run exchange-free on top of it (hash(src)
    // satisfies their clustering), and outdeg folds into the persisted
    // edge frame once — pre-r18 every iteration re-joined a separate
    // outdeg table (5 extra sorts/joins per run) and setup paid a second
    // (src, dst)-keyed exchange for distinct().
    val und = dir.union(dir.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("src"))
      .distinct()
    val outdeg = und.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val edgesW = und.join(outdeg, Seq("src")).persist()
    // node count — symmetric graph: outdeg ≥ 1 ⇔ node; also materializes
    // the weighted edge cache in the same job
    val n = edgesW.select(col("src")).distinct().count()
    require(n > 0, "pageRankFixedPoint: empty edge list")
    val r0 = scale / n
    val teleport = ((100L - dampingPct) * r0) / 100L
    var ranks = edgesW.select(col("src")).distinct()
      .select(col("src").as("node"), lit(r0).as("rank_fp"))
    for (_ <- 1 to iters) {
      // per iteration: one node-sized exchange (ranks to src) + one
      // partially-aggregated contribution exchange — the edge frame
      // itself never reshuffles
      val contrib = edgesW
        .join(ranks.select(col("node").as("src"), col("rank_fp").as("r")), Seq("src"))
        .select(col("dst").as("node"), expr("r div outdeg").as("c"))
      ranks = contrib.groupBy(col("node"))
        .agg(sum(col("c")).as("s")) // exact BIGINT sum — order-independent
        .select(col("node"),
          (lit(teleport) + expr(s"($dampingPct * s) div 100")).as("rank_fp"))
    }
    ranks
  }
}
