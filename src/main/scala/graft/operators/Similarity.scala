package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Encoder row types for the SemDeDup per-cell sweep (top-level public:
  * Catalyst's generated deserializers cannot touch private nested types). */
final case class SemDedupRow(id: Long, cell: Int, v: Seq[Double])
final case class SemDedupDecision(id: Long, cell: Int, kept: Boolean,
                                  keeper_id: Long)

object SemDedupRow {
  /** Sequential dot product — the same IEEE operation order as
    * [[graft.functions.VecDot]], so cosines computed here are
    * bit-identical to the Column-space replay in the gate. */
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Id-ordered greedy maximal independent set of one cell's threshold
    * graph: scan members by ascending id; a member joins the kept set
    * unless some already-kept member clears the cosine threshold, in
    * which case it drops with the FIRST such keeper (smallest kept id).
    * First-match early exit; O(m²·d) worst case with m cell-bounded. */
  def greedySweep(cell: Int, it: Iterator[SemDedupRow],
                  threshold: Double): Iterator[SemDedupDecision] = {
    val rows = it.toArray.sortBy(_.id)
    val vecs = rows.map(_.v.toArray)
    val norms = vecs.map(x => math.sqrt(dot(x, x)))
    val kept = scala.collection.mutable.ArrayBuffer.empty[Int]
    val out = new Array[SemDedupDecision](rows.length)
    var i = 0
    while (i < rows.length) {
      var keeper = -1L
      var k = 0
      while (keeper < 0 && k < kept.length) {
        val j = kept(k)
        if (dot(vecs(i), vecs(j)) / (norms(i) * norms(j)) >= threshold)
          keeper = rows(j).id
        k += 1
      }
      out(i) =
        if (keeper >= 0) SemDedupDecision(rows(i).id, cell, kept = false, keeper)
        else { kept += i; SemDedupDecision(rows(i).id, cell, kept = true, rows(i).id) }
      i += 1
    }
    out.iterator
  }
}

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Two paths, per the standard ANN architecture:
  *  - [[bruteForceTopK]]: exact cosine top-k. The query set is broadcast,
  *    the corpus streams through executors once (no corpus shuffle), and
  *    only the tiny (query x k) result shuffles for ranking. Exact and
  *    embarrassingly parallel — at 100 TB this is one full corpus scan per
  *    query batch, which is the right baseline.
  *  - [[lshTopK]]: random-hyperplane LSH with L tables of nBits each —
  *    candidates = union over tables of same-bucket vectors, scored
  *    exactly. Join per table is hash-partitioned on (table, bucket);
  *    corpus signatures are computed once. Sub-linear candidate sets at
  *    the cost of recall; the planted-near-dup spec measures it.
  *
  * Cosine math is plain double `Column` arithmetic (zip_with + aggregate
  * — codegen'd, no UDF), sequential over the vector exactly like the
  * oracle engine, so scores agree to the last ulp.
  */
object Similarity {

  /** Dot product of two array<double> columns. Native codegen'd expression
    * (sequential sum, bit-identical to the higher-order-function fold it
    * replaces but ~50x faster — HOF lambdas evaluate interpreted). */
  def dot(a: Column, b: Column): Column = graft.functions.VecDot.vecDot(a, b)

  /** L2 norm. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Vector width from the first row with a real (non-null, non-empty)
    * vector, or None when no row qualifies — callers return an empty,
    * correctly-shaped result instead of crashing in plan construction.
    * Probing past leading nulls matters: `head(1)` order is
    * partitioning-dependent, so keying off an arbitrary first row would
    * make a corpus with a few null vectors nondeterministically return
    * zero rows. */
  private def vecDim(emb: DataFrame, vecCol: String): Option[Int] =
    emb.select(size(col(vecCol)).as("d"))
      .filter(col("d").isNotNull && col("d") > 0)
      .head(1).toSeq.headOption.map(_.getInt(0))

  /** Zero-row frame in the (query_id, neighbor_id, rank, score) shape. */
  private def emptyTopK(emb: DataFrame, idCol: String): DataFrame =
    emb.select(col(idCol).as("query_id"), col(idCol).as("neighbor_id"),
      lit(0L).as("rank"), lit(0.0).as("score")).limit(0)

  /** Exact top-k by cosine for each query id. Output:
    * (query_id, neighbor_id, rank, score) with rank 1..k, self excluded,
    * ties broken by neighbor id. */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
                     queryIds: Column => Column, k: Int): DataFrame = {
    val e = emb.select(col(idCol).as("nid"), asDouble(col(vecCol)).as("nvec"))
    val q = emb.filter(queryIds(col(idCol)))
      .select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qvec"))
    val w = Window.partitionBy(col("qid")).orderBy(col("score_raw").desc, col("nid"))
    e.crossJoin(broadcast(q))
      .filter(col("nid") =!= col("qid"))
      .withColumn("score_raw", cosine(col("qvec"), col("nvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("nid").as("neighbor_id"),
        col("rank").cast("long").as("rank"), round(col("score_raw"), 4).as("score"))
  }

  /** Exact cosine RADIUS search (range query): every (query, neighbor)
    * pair with ROUND(cosine, 4) >= minCosine — the dedup/retrieval
    * companion of top-k when the caller wants "everything this similar",
    * not a fixed k. Filtering on the ROUNDED score keeps the boundary
    * decision identical across engines (the oracle applies the same
    * round-then-compare). Queries broadcast; the corpus streams through
    * one map-side cosine per row and sub-threshold rows die at the scan,
    * so only matching (qid, nid, score) scalars shuffle. */
  def bruteForceRadius(emb: DataFrame, idCol: String, vecCol: String,
                       queryIds: Column => Column, minCosine: Double): DataFrame = {
    val e = emb.select(col(idCol).as("nid"), asDouble(col(vecCol)).as("nvec"))
    val q = emb.filter(queryIds(col(idCol)))
      .select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qvec"))
    e.crossJoin(broadcast(q))
      .filter(col("nid") =!= col("qid"))
      .withColumn("score", round(cosine(col("qvec"), col("nvec")), 4))
      .filter(col("score") >= minCosine)
      .select(col("qid").as("query_id"), col("nid").as("neighbor_id"), col("score"))
  }

  /** IVF-probed radius search: same contract as [[bruteForceRadius]] but
    * candidates come from the query's `nProbe` nearest cells only, so each
    * query touches ~nProbe/nCentroids of the corpus. Every emitted pair is
    * exact (candidates re-score with the true cosine); only recall is
    * approximate — neighbors inside the radius but outside the probed
    * cells are missed, which [[radiusRecallGate]] measures against the
    * brute-force truth. */
  def ivfRadius(emb: DataFrame, idCol: String, vecCol: String,
                queryIds: Column => Column, minCosine: Double,
                centroids: Seq[Seq[Double]], nProbe: Int = 4): DataFrame = {
    if (centroids.isEmpty)
      return emb.select(col(idCol).as("query_id"), col(idCol).as("neighbor_id"),
        lit(0.0).as("score")).limit(0)
    val corpus = emb.select(col(idCol).as("nid"), asDouble(col(vecCol)).as("nvec"))
      .withColumn("cell",
        graft.functions.NearestCells.nearestCells(col("nvec"), centroids, 1).getItem(0))
    val q = emb.filter(queryIds(col(idCol)))
      .select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qvec"))
      .withColumn("cell", explode(graft.functions.NearestCells
        .nearestCells(col("qvec"), centroids, nProbe)))
    corpus.join(broadcast(q), Seq("cell"))
      .filter(col("nid") =!= col("qid"))
      .withColumn("score", round(cosine(col("qvec"), col("nvec")), 4))
      .filter(col("score") >= minCosine)
      .select(col("qid").as("query_id"), col("nid").as("neighbor_id"), col("score"))
  }

  /** Per-query radius-recall verdict: approximate radius results against
    * the brute-force truth. Every approx pair is exact-by-construction
    * (precision 1), so recall = found/true per query; queries with no
    * true neighbor pass vacuously. Emits the exactly-derivable n_true
    * beside the verdict so the oracle pins both. */
  def radiusRecallGate(approx: DataFrame, exact: DataFrame,
                       minRecall: Double): DataFrame = {
    val truth = broadcast(exact.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_true")))
    // approx ⊆ exact (same rounded-score filter), so a bare count is the hit count
    val found = broadcast(approx.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_found")))
    truth.join(found, Seq("query_id"), "left")
      .select(col("query_id"), col("n_true"),
        (coalesce(col("n_found"), lit(0L)).cast("double")
          >= lit(minRecall) * col("n_true").cast("double")).as("recall_ok"))
      .orderBy(col("query_id"))
  }

  /** Deterministic random hyperplanes: L*nBits planes of `dim` gaussians. */
  def hyperplanes(tables: Int, nBits: Int, dim: Int, seed: Long): Seq[Seq[Seq[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(tables)(Seq.fill(nBits)(Seq.fill(dim)(rnd.nextGaussian())))
  }

  /** LSH ANN top-k: candidates from L bucket tables, scored exactly.
    * Same output shape as [[bruteForceTopK]]. */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String,
              queryIds: Column => Column, k: Int,
              tables: Int = 8, nBits: Int = 6, seed: Long = 42L): DataFrame = {
    val dim = vecDim(emb, vecCol).getOrElse(return emptyTopK(emb, idCol))
    val planes = hyperplanes(tables, nBits, dim, seed)
    // (table, bucket) pairs from the native one-pass LshBits expression;
    // posexplode supplies the table index.
    val bucketsArr: Column => Column = vec =>
      graft.functions.LshBits.lshBits(vec, planes)

    val e = emb.select(col(idCol).as("nid"), asDouble(col(vecCol)).as("nvec"))
      .select(col("nid"), col("nvec"), posexplode(bucketsArr(col("nvec"))).as(Seq("t", "b")))
      .withColumn("tb", struct(col("t"), col("b"))).drop("t", "b")
    val q = emb.filter(queryIds(col(idCol)))
      .select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qvec"))
      .select(col("qid"), col("qvec"), posexplode(bucketsArr(col("qvec"))).as(Seq("t", "b")))
      .withColumn("tb", struct(col("t"), col("b"))).drop("t", "b")

    val w = Window.partitionBy(col("qid")).orderBy(col("score_raw").desc, col("nid"))
    // Score BEFORE dedup: a pair colliding in several tables recomputes its
    // (map-side, codegen'd) cosine per collision, but the distinct + window
    // shuffle then carries only (qid, nid, score) scalars instead of both
    // embedding vectors per candidate row — at 100 TB the candidate shuffle
    // is the bottleneck, not the dot products.
    e.join(broadcast(q), e("tb") === q("tb") && col("nid") =!= col("qid"))
      .withColumn("score_raw", cosine(col("qvec"), col("nvec")))
      .select(col("qid"), col("nid"), col("score_raw"))
      .distinct() // same pair => same score, so duplicates collapse exactly
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("nid").as("neighbor_id"),
        col("rank").cast("long").as("rank"), round(col("score_raw"), 4).as("score"))
  }

  /** IVF (inverted-file) ANN top-k: the corpus is partitioned into
    * `nCentroids` cells (nearest-centroid assignment; centroids are the
    * lowest-id corpus vectors — deterministic "training" without an
    * order-dependent averaging step), queries probe their `nProbe` nearest
    * cells, and candidates are scored exactly.
    *
    * Scale shape: assignment is one corpus scan (centroids broadcast as
    * literals); the probe join is an equi-join on cell id, so each query
    * touches ~nProbe/nCentroids of the corpus instead of all of it. The
    * standard IVF recall/cost dial is (nCentroids, nProbe). */
  /** Deterministic Lloyd refinement of IVF centroids: each iteration
    * assigns every vector to its nearest centroid (native one-pass probe)
    * and recomputes each cell's mean with the one-pass [[graft.functions
    * .VecMeanAgg]] — exact decimal sums, so the result is identical on any
    * partitioning/cluster size (double sums would drift with aggregation
    * order). Each iteration is ONE corpus scan whose shuffle carries only
    * nCentroids (count, sums) buffers — NOT a rows x dim explode — and
    * collects nCentroids mean vectors (bounded, not data-sized).
    * Lloyd never increases total distortion, so refined centroids are
    * at least as good as the init; empty cells keep their previous
    * centroid. */
  def refineCentroids(vecs: DataFrame, vecCol: String,
                      init: Seq[Seq[Double]], iters: Int): Seq[Seq[Double]] = {
    var cents = init
    for (_ <- 0 until iters) {
      val cellMeans = vecs
        .withColumn("cell",
          graft.functions.NearestCells.nearestCells(col(vecCol), cents, 1).getItem(0))
        .groupBy(col("cell"))
        .agg(graft.functions.VecMeanAgg.vecMean(col(vecCol)).as("mean"))
        .collect()
      val byCell = cellMeans.iterator
        .filter(r => !r.isNullAt(r.fieldIndex("mean")))
        .map(r => r.getAs[Int]("cell") ->
          r.getSeq[Double](r.fieldIndex("mean")).toIndexedSeq)
        .toMap
      cents = cents.indices.map(ci => byCell.getOrElse(ci, cents(ci))).toIndexedSeq
    }
    cents
  }

  /** Centroid training shared by the IVF variants: lowest-id init
    * (deterministic, no order-dependent averaging) + Lloyd refinement.
    * Returns empty when the corpus has no usable vectors. The init
    * collect + each Lloyd iteration is a full corpus pass, so the casted
    * projection is cached for the duration (unpersisted before return —
    * the caller's final query plan re-reads the source, keeping the
    * returned DataFrame cache-independent). */
  private def trainCentroids(emb: DataFrame, idCol: String, vecCol: String,
                             nCentroids: Int, lloydIters: Int): Seq[Seq[Double]] = {
    // Null/empty vectors are filtered here, which both keeps degenerate
    // rows out of the init centroids and doubles as the empty-corpus probe
    // (no separate vecDim scan).
    val projected = emb
      .select(col(idCol).as("pid"), asDouble(col(vecCol)).as("v"))
      .filter(col("v").isNotNull && size(col("v")) > 0)
    projected.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val init: Seq[Seq[Double]] = projected
        .orderBy(col("pid")).limit(nCentroids)
        .select(col("v")).collect()
        .map(_.getSeq[Double](0).toIndexedSeq).toIndexedSeq
      // lowest-id init is deterministic but data-dependent; a few Lloyd
      // rounds spread the centroids toward the true cluster structure
      if (init.isEmpty) IndexedSeq.empty
      else refineCentroids(projected.select(col("v")), "v", init, lloydIters)
    } finally projected.unpersist(blocking = false)
  }

  /** Public index-build entry: train IVF centroids ONCE and reuse them
    * across query batches via [[ivfTopKServe]] / [[ivfTopKInt8Serve]] —
    * the serve-many shape. [[ivfTopK]] / [[ivfTopKInt8]] train per call
    * (right for one-shot gates); a production deployment trains at index
    * build and serves with frozen centroids, skipping the init collect +
    * Lloyd corpus passes on every batch. */
  def trainIvfCentroids(emb: DataFrame, idCol: String, vecCol: String,
                        nCentroids: Int = 16, lloydIters: Int = 2): Seq[Seq[Double]] =
    trainCentroids(emb, idCol, vecCol, nCentroids, lloydIters)

  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String,
              queryIds: Column => Column, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4,
              lloydIters: Int = 2): DataFrame =
    ivfTopKServe(emb, idCol, vecCol, queryIds, k,
      trainCentroids(emb, idCol, vecCol, nCentroids, lloydIters), nProbe)

  /** Materialize the corpus's IVF cell assignments as a PERSISTENT
    * bucketed index — the ANN counterpart of the BM25 and near-dup
    * standing indexes, completing the build/serve/append trio across
    * every retrieval leg: (cell, id, vec) bucketed AND sorted on cell,
    * so a serve probe's cell filter prunes buckets/stripes and the
    * corpus side of the candidate join plans exchange-free. Centroids
    * are the caller's frozen artifact ([[trainIvfCentroids]]); serve and
    * append must use the same ones (cell ids are centroid indexes). */
  def buildIvfIndex(emb: DataFrame, idCol: String, vecCol: String,
                    table: String, centroids: Seq[Seq[Double]],
                    numBuckets: Int = 16): Unit =
    graft.sinks.OrcSink.writeBucketed(
      indexRows(emb, idCol, vecCol, centroids),
      table, bucketCols = Seq("cell"), numBuckets = numBuckets)

  /** Distribution-drift statistic for IVF index MAINTENANCE: the
    * Kolmogorov-Smirnov distance between two corpus snapshots'
    * assignment-confidence distributions (each vector's cosine to its
    * nearest centroid, 4dp-gridded) under the SAME frozen centroids.
    * Centroids fitted to the reference distribution hold confidences
    * high; after a distribution shift the current snapshot's vectors sit
    * far from every stale centroid and the confidence mass collapses —
    * ks_d -> 1. This is the trigger side of the recluster story: the KS
    * monitor ([[Profile.ksStatistic]], the same statistic the streaming
    * drift gate pins) decides WHEN [[reclusterIvfIndex]] runs.
    *
    * Scale shape: two map-only confidence scans (compiled
    * [[graft.functions.NearestCells]] probe + one cosine each), one
    * grid-bounded aggregation (<= 10001 distinct 4dp confidence values),
    * and the KS windows run over that bounded grid — never corpus rows.
    * Output: 1-row (ks_d, argmax_q). */
  def ivfAssignmentDrift(reference: DataFrame, current: DataFrame,
                         idCol: String, vecCol: String,
                         centroids: Seq[Seq[Double]]): DataFrame = {
    require(centroids.nonEmpty, "ivfAssignmentDrift needs trained centroids")
    val labeled = centroids.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    def conf(df: DataFrame, side: Int) =
      assignClusters(df, idCol, vecCol, labeled)
        .select(col("cosine").as("q"), lit(side).as("side"))
    Profile.ksStatistic(
      conf(reference, 1).unionByName(conf(current, 2))
        .groupBy(col("q"))
        .agg(sum(when(col("side") === 1, 1L).otherwise(0L)).as("c1"),
          sum(when(col("side") === 2, 1L).otherwise(0L)).as("c2")))
  }

  /** Drift-recovery RECLUSTER of a persisted IVF index: re-route every
    * standing catalog row under refreshed centroids (retrained on a
    * bounded sample of the post-drift corpus — [[trainIvfCentroids]]'s
    * collect ceiling applies) and rewrite the bucketed catalog. Reads
    * the index table itself — id + vector ride in the catalog rows, so
    * the corpus is NOT rescanned — reassigns cells with the compiled
    * [[graft.functions.NearestCells]] kernel (map-only), and the only
    * exchange is the bucketed write's hash partition on the new cell
    * key: one shuffle for the whole re-route, O(index) work.
    * The old table stays readable throughout (new table name = atomic
    * cutover by catalog swap, the standard blue/green index flip). */
  def reclusterIvfIndex(spark: org.apache.spark.sql.SparkSession,
                        table: String, newTable: String,
                        centroids: Seq[Seq[Double]],
                        numBuckets: Int = 16): Unit = {
    require(centroids.nonEmpty, "reclusterIvfIndex needs trained centroids")
    val rows = spark.table(table)
      .select(col("id"), col("vec"))
      .withColumn("cell", graft.functions.NearestCells
        .nearestCells(col("vec"), centroids, 1).getItem(0))
    graft.sinks.OrcSink.writeBucketed(rows, newTable,
      bucketCols = Seq("cell"), numBuckets = numBuckets)
  }

  /** Append an ingested batch to the standing IVF index (new files per
    * bucket, standing rows never rewritten — O(batch) per update). */
  def appendToIvfIndex(batch: DataFrame, idCol: String, vecCol: String,
                       table: String, centroids: Seq[Seq[Double]],
                       numBuckets: Int = 16): Unit =
    indexRows(batch, idCol, vecCol, centroids)
      .write.mode("append").format("orc")
      .bucketBy(numBuckets, "cell").sortBy("cell")
      .saveAsTable(table)

  private def indexRows(emb: DataFrame, idCol: String, vecCol: String,
                        centroids: Seq[Seq[Double]]): DataFrame = {
    require(centroids.nonEmpty, "buildIvfIndex needs trained centroids")
    emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("vec"))
      .withColumn("cell", graft.functions.NearestCells
        .nearestCells(col("vec"), centroids, 1).getItem(0))
  }

  /** Top-k served from the PERSISTENT index: query vectors probe nProbe
    * cells, the cell filter reaches the index scan (bucket/stripe
    * pruning — absent cells cost no I/O), exact cosine + per-query
    * top-k. Identical results to [[ivfTopKServe]] on the same centroids
    * (spec-pinned); zero corpus-embedding scans outside the index. */
  def ivfIndexServe(spark: org.apache.spark.sql.SparkSession, table: String,
                    queryEmb: DataFrame, idCol: String, vecCol: String,
                    queryIds: Column => Column, k: Int,
                    centroids: Seq[Seq[Double]], nProbe: Int = 4): DataFrame = {
    if (centroids.isEmpty) return emptyTopK(queryEmb, idCol)
    val q = queryEmb.filter(queryIds(col(idCol)))
      .select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qvec"))
      .withColumn("cell", explode(graft.functions.NearestCells
        .nearestCells(col("qvec"), centroids, nProbe)))
    val w = Window.partitionBy(col("qid")).orderBy(col("score_raw").desc, col("nid"))
    spark.table(table).select(col("cell"), col("id").as("nid"), col("vec").as("nvec"))
      .join(broadcast(q), Seq("cell"))
      .filter(col("nid") =!= col("qid"))
      .withColumn("score_raw", cosine(col("qvec"), col("nvec")))
      .select(col("qid"), col("nid"), col("score_raw"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("nid").as("neighbor_id"),
        col("rank").cast("long").as("rank"), round(col("score_raw"), 4).as("score"))
  }

  /** IVF serve path against FROZEN centroids (see [[trainIvfCentroids]]). */
  def ivfTopKServe(emb: DataFrame, idCol: String, vecCol: String,
                   queryIds: Column => Column, k: Int,
                   centroids: Seq[Seq[Double]], nProbe: Int = 4): DataFrame = {
    if (centroids.isEmpty) return emptyTopK(emb, idCol)

    // native one-pass probe expression (argmax = probe with nProbe=1)
    val corpus = emb.select(col(idCol).as("nid"), asDouble(col(vecCol)).as("nvec"))
      .withColumn("cell",
        graft.functions.NearestCells.nearestCells(col("nvec"), centroids, 1).getItem(0))
    val q = emb.filter(queryIds(col(idCol)))
      .select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qvec"))
      .withColumn("cell",
        explode(graft.functions.NearestCells.nearestCells(col("qvec"), centroids, nProbe)))

    val w = Window.partitionBy(col("qid")).orderBy(col("score_raw").desc, col("nid"))
    // No dedup needed (unlike lshTopK): each corpus vector is assigned
    // exactly ONE cell and a query's probed cells are distinct, so a
    // (qid, nid) pair can appear at most once. The window shuffle carries
    // (qid, nid, score) scalars, never the embedding vectors.
    corpus.join(broadcast(q), Seq("cell"))
      .filter(col("nid") =!= col("qid"))
      .withColumn("score_raw", cosine(col("qvec"), col("nvec")))
      .select(col("qid"), col("nid"), col("score_raw"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("nid").as("neighbor_id"),
        col("rank").cast("long").as("rank"), round(col("score_raw"), 4).as("score"))
  }

  /** IVF ANN over the int8-quantized embedding store — the corpus-scale
    * serving shape: candidate generation touches ONLY the 4x-smaller
    * quantized index (cell probe + dot products against int8-reconstructed
    * vectors), and the float originals are read back just for the exact
    * re-rank of each query's `shortlist` best candidates. Output shape
    * matches [[bruteForceTopK]] and scores are EXACT float cosines, so
    * quantization error affects recall only, never the reported scores.
    *
    * Scale shape: the quantized index is one corpus scan (centroids
    * broadcast); the probe join is an equi-join on cell id carrying
    * (qid, nid, approx-score) scalars; the float re-read is a broadcast
    * semi-join against the tiny (queries x shortlist) id set, so the full
    * float store is never shuffled. `shortlist` defaults to 3*k
    * candidates per query (pass an explicit value to widen the re-rank
    * headroom when the quantization error budget demands it). */
  def ivfTopKInt8(emb: DataFrame, idCol: String, vecCol: String,
                  queryIds: Column => Column, k: Int,
                  nCentroids: Int = 16, nProbe: Int = 4,
                  lloydIters: Int = 2, shortlist: Int = 0): DataFrame =
    ivfTopKInt8Serve(emb, idCol, vecCol, queryIds, k,
      trainCentroids(emb, idCol, vecCol, nCentroids, lloydIters),
      nProbe, shortlist)

  /** Int8 IVF serve path against FROZEN centroids (see
    * [[trainIvfCentroids]]). */
  def ivfTopKInt8Serve(emb: DataFrame, idCol: String, vecCol: String,
                       queryIds: Column => Column, k: Int,
                       centroids: Seq[Seq[Double]], nProbe: Int = 4,
                       shortlist: Int = 0): DataFrame = {
    val shortlistN = if (shortlist > 0) shortlist else 3 * k
    require(shortlistN >= k, s"shortlist must be >= k, got $shortlistN < $k")
    if (centroids.isEmpty) return emptyTopK(emb, idCol)

    // int8 index build: per-vector affine codes (identical math to
    // [[quantizeInt8]]) + cell assignment from the float vector — both
    // available at index-build time; serving reads only this frame.
    // Candidate scoring must NOT evaluate `cosine(q, dequantize(codes))`
    // literally: `dequantize` is a higher-order `transform` (interpreted,
    // CodegenFallback), the cosine references it three times — each
    // re-evaluated per candidate row — and its presence drops the whole
    // probe stage out of codegen (measured 2.3x the float engine at
    // sf0.1). Instead the cosine over the affine reconstruction is
    // expanded algebraically so per-candidate work is ONE native VecDot:
    //   dot(q, mn + sc*c)  = mn*sum(q) + sc*dot(q, c)
    //   |mn + sc*c|^2      = d*mn^2 + 2*mn*sc*sum(c) + sc^2*dot(c, c)
    // with every sum/dot on the right either per-query or precomputed at
    // index build. Same math (reassociated, so equal to within ulps —
    // ranking input only; reported scores come from the exact re-rank).
    val v = asDouble(col(vecCol))
    val dot_ = graft.functions.VecDot.vecDot _
    def sumArr(c: Column): Column = dot_(c, array_repeat(lit(1.0), size(c)))
    val qz = graft.functions.Int8Quantize.int8Quantize(v)
    val index = emb
      .filter(v.isNotNull && size(v) > 0)
      .select(col(idCol).as("nid"), qz.as("qz"),
        graft.functions.NearestCells.nearestCells(v, centroids, 1)
          .getItem(0).as("cell"))
      .select(col("nid"), col("cell"),
        col("qz.codes").cast("array<double>").as("cd"),
        col("qz.q_min").as("q_min"), col("qz.q_scale").as("q_scale"))
      .withColumn("deq_norm", sqrt(
        size(col("cd")) * col("q_min") * col("q_min")
          + lit(2.0) * col("q_min") * col("q_scale") * sumArr(col("cd"))
          + col("q_scale") * col("q_scale") * dot_(col("cd"), col("cd"))))

    val q = emb.filter(queryIds(col(idCol)))
      .select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qvec"))
      .withColumn("q_norm", sqrt(dot_(col("qvec"), col("qvec"))))
      .withColumn("s_q", sumArr(col("qvec")))
      .withColumn("cell",
        explode(graft.functions.NearestCells.nearestCells(col("qvec"), centroids, nProbe)))

    // approximate scoring against the int8 index; no dedup needed — one
    // cell per index vector, distinct probed cells per query, so (qid,
    // nid) pairs are unique; the window shuffle carries scalars only
    val wq = Window.partitionBy(col("qid")).orderBy(col("score_q").desc, col("nid"))
    val short = index.join(broadcast(q), Seq("cell"))
      .filter(col("nid") =!= col("qid"))
      .withColumn("score_q",
        (col("q_min") * col("s_q") + col("q_scale") * dot_(col("qvec"), col("cd")))
          / (col("q_norm") * col("deq_norm")))
      .select(col("qid"), col("nid"), col("score_q"))
      .withColumn("rq", row_number().over(wq))
      .filter(col("rq") <= shortlistN)
      .select(col("qid"), col("nid"))

    exactReRank(emb, idCol, vecCol, queryIds, short, k)
  }

  /** Exact float re-rank of a (qid, nid) shortlist — the final stage every
    * quantized serving path shares: float vectors re-join ONLY for the
    * shortlist ids (broadcast, so the float store streams unshuffled) and
    * the reported scores are exact cosines; quantization error can affect
    * recall, never scores. */
  private def exactReRank(emb: DataFrame, idCol: String, vecCol: String,
                          queryIds: Column => Column, short: DataFrame,
                          k: Int): DataFrame = {
    val floats = emb.select(col(idCol).as("nid"), asDouble(col(vecCol)).as("nvec"))
    val qv = emb.filter(queryIds(col(idCol)))
      .select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qvec"))
    val wr = Window.partitionBy(col("qid")).orderBy(col("score_raw").desc, col("nid"))
    floats.join(broadcast(short), Seq("nid"))
      .join(broadcast(qv), Seq("qid"))
      .withColumn("score_raw", cosine(col("qvec"), col("nvec")))
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("nid").as("neighbor_id"),
        col("rank").cast("long").as("rank"), round(col("score_raw"), 4).as("score"))
  }

  /** Train `m` per-subspace PQ codebooks (Jégou et al. 2011): the vector
    * splits into m contiguous subspaces of dim/m dims; each subspace gets
    * its own `ksub`-centroid L2 k-means codebook — lowest-id init (the
    * same deterministic convention as the IVF coarse training) + Lloyd
    * refinement with exact-decimal [[graft.functions.VecMeanAgg]] means,
    * so the codebooks are identical on any partitioning/cluster size.
    *
    * Assignment inside Lloyd uses the SAME L2 argmin as [[graft.functions
    * .PqEncode]] (one native pass computing all m subspace codes), so
    * training optimizes exactly the quantizer that encoding applies.
    * Each iteration is one cached-corpus scan per subspace whose shuffle
    * carries ksub (count, sum) buffers. `trainLimit` > 0 trains on the
    * lowest-`trainLimit`-id rows only — the production dial: PQ codebooks
    * are trained on a bounded sample (100k-1M rows), never the full
    * 100 TB corpus.
    *
    * Returns empty when the corpus has no usable vectors. Requires
    * dim % m == 0 (contiguous equal subspaces). */
  def trainPqCodebooks(emb: DataFrame, idCol: String, vecCol: String,
                       m: Int = 8, ksub: Int = 16, lloydIters: Int = 2,
                       trainLimit: Int = 0): Seq[Seq[Seq[Double]]] = {
    require(m > 0 && ksub > 0, s"need m > 0 and ksub > 0, got $m/$ksub")
    val projected0 = emb
      .select(col(idCol).as("pid"), asDouble(col(vecCol)).as("v"))
      .filter(col("v").isNotNull && size(col("v")) > 0)
    val projected =
      if (trainLimit > 0) projected0.orderBy(col("pid")).limit(trainLimit)
      else projected0
    projected.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val initRows = projected.orderBy(col("pid")).limit(ksub)
        .select(col("v")).collect()
        .map(_.getSeq[Double](0).toIndexedSeq).toIndexedSeq
      if (initRows.isEmpty) return IndexedSeq.empty
      val dim = initRows.head.length
      require(dim % m == 0, s"vector dim $dim not divisible into $m subspaces")
      val sub = dim / m
      // m codebooks initialized from the lowest-id rows' subspace slices
      var books: IndexedSeq[IndexedSeq[IndexedSeq[Double]]] =
        (0 until m).map(j => initRows.map(v => v.slice(j * sub, (j + 1) * sub)))
      for (_ <- 0 until lloydIters) {
        // ONE native pass computes every subspace's assignment, then ONE
        // job folds ALL m subspaces' slice means in a single (subspace,
        // cell)-keyed aggregation (r18, guide §1.2 — was a driver loop of
        // m collect jobs per iteration). Exploded rows carry only the
        // sub-dim slice, the exchange is m*ksub mean buffers, and per-
        // group rows arrive in the same partition-then-mapId order as the
        // former per-subspace jobs, so the double sums — and hence the
        // codebooks — are bit-identical.
        val assigned = projected.withColumn("codes",
          graft.functions.PqEncode.pqEncode(col("v"),
            books.map(_.map(_.toSeq).toSeq).toSeq).getField("codes"))
        val means = assigned
          .select(posexplode(col("codes")).as(Seq("j", "cell")), col("v"))
          .select(col("j"), col("cell"),
            slice(col("v"), col("j") * lit(sub) + lit(1), lit(sub)).as("vs"))
          .groupBy(col("j"), col("cell"))
          .agg(graft.functions.VecMeanAgg.vecMean(col("vs")).as("mean"))
          .collect()
        val byJc = means.iterator
          .filter(r => !r.isNullAt(r.fieldIndex("mean")))
          .map(r => (r.getInt(0), r.getAs[Int]("cell")) ->
            r.getSeq[Double](r.fieldIndex("mean")).toIndexedSeq)
          .toMap
        books = (0 until m).map { j =>
          books(j).indices.map(c => byJc.getOrElse((j, c), books(j)(c)))
            .toIndexedSeq
        }.toIndexedSeq
      }
      books.map(_.map(_.toSeq: Seq[Double]).toSeq: Seq[Seq[Double]]).toSeq
    } finally projected.unpersist(blocking = false)
  }

  /** IVF-PQ ANN (IVFADC, Jégou et al. 2011 §IV — non-residual variant):
    * coarse IVF cells bound which candidates each query touches, and
    * within the probed cells scoring runs against the PQ-compressed index
    * — m small ints + one norm per vector instead of d doubles, the
    * ~10-30x index shrink that makes the candidate scan affordable when
    * the embedding store is 100 TB. Scores for the shortlist are exact
    * float cosines (asymmetric re-rank), so compression affects recall
    * only, never reported scores. Trains coarse centroids + codebooks per
    * call; production serves frozen ones via [[ivfTopKPqServe]]. */
  def ivfTopKPq(emb: DataFrame, idCol: String, vecCol: String,
                queryIds: Column => Column, k: Int,
                nCentroids: Int = 16, nProbe: Int = 4,
                m: Int = 8, ksub: Int = 16, lloydIters: Int = 2,
                shortlist: Int = 0): DataFrame =
    ivfTopKPqServe(emb, idCol, vecCol, queryIds, k,
      trainCentroids(emb, idCol, vecCol, nCentroids, lloydIters),
      trainPqCodebooks(emb, idCol, vecCol, m, ksub, lloydIters),
      nProbe, shortlist)

  /** IVF-PQ serve path against FROZEN coarse centroids + codebooks.
    *
    * Index build (once): cell assignment from the float vector + PQ codes
    * + reconstruction norm — one corpus scan, all native expressions.
    * Serving: the probe equi-join carries (qid, nid, approx-score)
    * scalars; per-candidate work is ONE compiled ADC dot against the
    * compressed codes; the float store re-joins only for the broadcast
    * shortlist id set. */
  def ivfTopKPqServe(emb: DataFrame, idCol: String, vecCol: String,
                     queryIds: Column => Column, k: Int,
                     centroids: Seq[Seq[Double]],
                     codebooks: Seq[Seq[Seq[Double]]],
                     nProbe: Int = 4, shortlist: Int = 0): DataFrame = {
    val shortlistN = if (shortlist > 0) shortlist else 3 * k
    require(shortlistN >= k, s"shortlist must be >= k, got $shortlistN < $k")
    if (centroids.isEmpty || codebooks.isEmpty) return emptyTopK(emb, idCol)

    val v = asDouble(col(vecCol))
    val pq = graft.functions.PqEncode.pqEncode(v, codebooks)
    val index = emb
      .filter(v.isNotNull && size(v) > 0)
      .select(col(idCol).as("nid"),
        graft.functions.NearestCells.nearestCells(v, centroids, 1)
          .getItem(0).as("cell"),
        pq.getField("codes").as("codes"),
        pq.getField("recon_norm").as("recon_norm"))

    val q = emb.filter(queryIds(col(idCol)))
      .select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qvec"))
      .withColumn("q_norm",
        sqrt(graft.functions.VecDot.vecDot(col("qvec"), col("qvec"))))
      .withColumn("cell",
        explode(graft.functions.NearestCells.nearestCells(col("qvec"), centroids, nProbe)))

    // approximate cosine against the compressed index; no dedup needed —
    // one cell per index vector, distinct probed cells per query
    val wq = Window.partitionBy(col("qid")).orderBy(col("score_q").desc, col("nid"))
    val short = index.join(broadcast(q), Seq("cell"))
      .filter(col("nid") =!= col("qid"))
      .withColumn("score_q",
        graft.functions.PqAdcDot.pqAdcDot(col("qvec"), col("codes"), codebooks)
          / (col("q_norm") * col("recon_norm")))
      .select(col("qid"), col("nid"), col("score_q"))
      .withColumn("rq", row_number().over(wq))
      .filter(col("rq") <= shortlistN)
      .select(col("qid"), col("nid"))

    exactReRank(emb, idCol, vecCol, queryIds, short, k)
  }

  /** Recall-at-k gate: for each query, how many of `approx`'s returned
    * neighbors are of near-top-k QUALITY — i.e. score at least the exact
    * k-th best score minus `eps` for that query (score-based matching with
    * slack, the standard epsilon-recall ANN quality measure; it is immune
    * to equal-score tie ordering between the approximate and exact
    * rankings). Emits one row per query id in `exact`:
    * (query_id, recall_ok = hits >= minHits).
    *
    * Both inputs are in the bruteForceTopK output shape. With a fixed seed
    * the approximate result is fully deterministic (hashes are
    * partition-count-invariant), so on a fixed corpus `recall_ok` is a
    * deterministic boolean the correctness oracle can pin to `true` — this
    * turns the rows-only ANN probes into hard oracle gates. */
  def recallGate(approx: DataFrame, exact: DataFrame, minHits: Int,
                 eps: Double = 0.0): DataFrame = {
    // both join operands are one-row-per-query frames — broadcast them
    // rather than letting the static planner pick a sort-merge join
    val kth = broadcast(exact.groupBy(col("query_id"))
      .agg(min(col("score")).as("kth_score")))
    val hits = broadcast(approx.join(kth, Seq("query_id"))
      .filter(col("score") >= col("kth_score") - eps)
      .groupBy(col("query_id")).agg(count(lit(1)).as("hits")))
    kth.join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        (coalesce(col("hits"), lit(0L)) >= minHits).as("recall_ok"))
      .orderBy(col("query_id"))
  }

  /** Scalar int8 quantization of an embedding column — the standard 4x
    * memory/IO reduction for corpus-scale ANN (a 100 TB float32 embedding
    * store becomes 25 TB; candidate generation runs on the quantized
    * vectors, exact re-scoring on the float originals). Per-vector affine
    * quantization: code(i) = round((v(i) - min) / scale) in 0..255 with
    * scale = (max - min) / 255, stored alongside (min, scale) so
    * [[dequantize]] reconstructs within scale/2 per element. All math is
    * plain Column double arithmetic (codegen'd, engine-portable).
    * Degenerate constant vectors (max == min) get scale 0 and codes 0.
    * Output: idCol, codes array<int>, q_min double, q_scale double. */
  def quantizeInt8(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    // one compiled pass per row ([[graft.functions.Int8Quantize]]); the
    // equivalent transform() lambda re-scans the vector per element
    // (array_min/max inlined into the lambda — O(d²) interpreted) and
    // drops the stage out of codegen. Bit-equivalence spec'd.
    val qz = graft.functions.Int8Quantize.int8Quantize(asDouble(col(vecCol)))
    emb.select(col(idCol), qz.as("qz"))
      .select(col(idCol), col("qz.codes").as("codes"),
        col("qz.q_min").as("q_min"), col("qz.q_scale").as("q_scale"))
  }

  /** Reconstruct doubles from [[quantizeInt8]] output:
    * v'(i) = q_min + codes(i) * q_scale. Max per-element error is
    * q_scale / 2 by construction. */
  def dequantize(codes: Column, qMin: Column, qScale: Column): Column =
    transform(codes, c => qMin + c.cast("double") * qScale)

  /** Deterministic Gaussian random projection (the Johnson-Lindenstrauss
    * dimensionality reducer): `vecCol` maps from its native dimension to
    * `outDim` through a seeded N(0, 1/outDim) matrix — same derivation
    * as [[hyperplanes]] (scala.util.Random(seed)), so the matrix is
    * identical on every executor and cluster topology with zero RNG
    * state. Inner products are preserved within ~1/sqrt(outDim)
    * relative distortion, so projected-space rankings track exact ones
    * while every downstream shuffle/broadcast of an ANN funnel carries
    * outDim/dim of the vector bytes (64 -> 32 halves candidate-
    * generation I/O; at 100 TB the candidate shuffle is the bottleneck,
    * not the dot products). The projection itself is a codegen'd
    * zip_with + aggregate fold per output component — no UDF, one scan,
    * no shuffle. Compose with [[ivfTopK]]/[[lshTopK]] for bounded
    * candidate generation on top of the narrower vectors. */
  def randomProject(emb: DataFrame, idCol: String, vecCol: String,
                    outDim: Int, seed: Long = 42L): DataFrame = {
    val dim = vecDim(emb, vecCol).getOrElse(
      return emb.select(col(idCol), asDouble(col(vecCol)).as(vecCol)))
    require(outDim >= 1 && outDim <= dim, s"outDim=$outDim must be in [1, $dim]")
    val rnd = new scala.util.Random(seed)
    val scale = 1.0 / math.sqrt(outDim)
    val mat = Seq.fill(outDim)(Seq.fill(dim)(rnd.nextGaussian() * scale))
    val v = asDouble(col(vecCol))
    val proj = array(mat.map { row =>
      aggregate(zip_with(v, lit(row.toArray), (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x)
    }: _*)
    emb.select(col(idCol), proj.as(vecCol))
  }

  /** ANN via a random-projection shortlist: candidates ranked by cosine
    * in the projected space (the compressed tier — here compression is
    * dimensionality instead of int8/PQ code width), then the `shortlist`
    * survivors re-rank exactly in float — the same shortlist + exact
    * re-rank shape as [[ivfTopKInt8]]/[[ivfTopKPq]], so precision of the
    * returned scores is exact and only candidate recall depends on the
    * projection distortion. Shortlist ids travel as bare (query,
    * neighbor) pairs; full vectors re-join only for the |Q|*shortlist
    * surviving rows. */
  def rpTopK(emb: DataFrame, idCol: String, vecCol: String,
             queryIds: Column => Column, k: Int,
             outDim: Int = 32, shortlist: Int = 0,
             seed: Long = 42L): DataFrame = {
    val sl = if (shortlist > 0) shortlist else 4 * k
    val short = bruteForceTopK(randomProject(emb, idCol, vecCol, outDim, seed),
        idCol, vecCol, queryIds, sl)
      .select(col("query_id"), col("neighbor_id"))
    exactRerank(emb, idCol, vecCol, queryIds, short, k)
  }

  /** Exact float re-rank of a (query_id, neighbor_id) shortlist — the
    * shared tail of every compressed-tier ANN path ([[rpTopK]],
    * [[pcaTopK]]): shortlist ids travel as bare pairs, full vectors
    * re-join only for the |Q|*shortlist surviving rows, scores are exact
    * cosine. Output shape matches [[bruteForceTopK]]. */
  private def exactRerank(emb: DataFrame, idCol: String, vecCol: String,
                          queryIds: Column => Column, short: DataFrame,
                          k: Int): DataFrame = {
    val nvecs = emb.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("nvec"))
    val qvecs = emb.filter(queryIds(col(idCol)))
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qvec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_raw").desc, col("neighbor_id"))
    short.join(nvecs, Seq("neighbor_id"))
      .join(broadcast(qvecs), Seq("query_id"))
      .withColumn("score_raw", cosine(col("qvec"), col("nvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("long").as("rank"),
        round(col("score_raw"), 4).as("score"))
  }

  /** Deterministic PCA trained on a bounded id-ordered sample: the
    * data-adaptive counterpart of [[randomProject]] — where JL spends
    * outDim dimensions uniformly, PCA spends them on the directions the
    * corpus actually varies in, so the same compression keeps more of
    * the neighborhood structure (higher shortlist recall at equal
    * outDim, or equal recall at lower outDim = fewer candidate-shuffle
    * bytes).
    *
    * 100 TB posture: you never eigendecompose the corpus — the
    * projection is TRAINED on a bounded sample (`maxTrainRows`, the
    * frozen-centroid pattern of [[trainIvfCentroids]]) and APPLIED
    * corpus-wide as a codegen'd fold. Determinism: the sample is the
    * first `maxTrainRows` ids in id order; mean/covariance accumulate on
    * the driver in that fixed order (no partitioning-dependent double
    * summation); breeze `eigSym` of the same matrix is bit-stable; each
    * component's sign is normalized (largest-|entry| coordinate made
    * positive, lowest index on ties). Same inputs => same projection on
    * any cluster.
    *
    * Returns (mean, components): `components` are the top `outDim`
    * eigenvectors of the sample covariance, eigenvalue-descending. */
  def trainPcaProjection(emb: DataFrame, idCol: String, vecCol: String,
                         outDim: Int, maxTrainRows: Int = 2048)
      : (Array[Double], Array[Array[Double]]) = {
    val (m, c, _) = trainPcaWhitening(emb, idCol, vecCol, outDim, maxTrainRows)
    (m, c)
  }

  /** [[trainPcaProjection]] plus the per-component eigenvalues — what a
    * WHITENING transform needs (Su et al. 2021, "Whitening Sentence
    * Representations": projected coordinates divided by sqrt(lambda) so
    * every retained direction carries unit variance, the standard
    * post-processing that repairs anisotropic embedding spaces before
    * cosine retrieval). */
  def trainPcaWhitening(emb: DataFrame, idCol: String, vecCol: String,
                        outDim: Int, maxTrainRows: Int = 2048)
      : (Array[Double], Array[Array[Double]], Array[Double]) = {
    val sample = emb
      .select(col(idCol).cast("string").as("id"), asDouble(col(vecCol)).as("v"))
      .filter(col("v").isNotNull && size(col("v")) > 0)
      .orderBy(col("id")).limit(maxTrainRows)
      .collect()
      .map(r => (r.getString(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1) // driver-side re-sort: collect order is not contractual
      .map(_._2)
    val n = sample.length
    require(n >= 2, s"PCA needs >= 2 sample vectors, got $n")
    val dim = sample(0).length
    require(outDim >= 1 && outDim <= dim, s"outDim=$outDim not in [1, $dim]")
    require(sample.forall(_.length == dim), "ragged vector widths in sample")
    val mean = new Array[Double](dim)
    sample.foreach { v =>
      var i = 0; while (i < dim) { mean(i) += v(i); i += 1 }
    }
    locally { var i = 0; while (i < dim) { mean(i) /= n; i += 1 } }
    val cov = breeze.linalg.DenseMatrix.zeros[Double](dim, dim)
    sample.foreach { v =>
      var a = 0
      while (a < dim) {
        val da = v(a) - mean(a)
        var b = 0
        while (b < dim) { cov(a, b) += da * (v(b) - mean(b)); b += 1 }
        a += 1
      }
    }
    cov :/= (n - 1).toDouble
    val es = breeze.linalg.eigSym(cov) // eigenvalues ascending
    val comps = Array.tabulate(outDim) { j =>
      val cidx = dim - 1 - j
      val vec = Array.tabulate(dim)(r => es.eigenvectors(r, cidx))
      val anchor = vec.indices.maxBy(i => (math.abs(vec(i)), -i))
      if (vec(anchor) < 0) vec.map(x => -x) else vec
    }
    val eigvals = Array.tabulate(outDim)(j => es.eigenvalues(dim - 1 - j))
    (mean, comps, eigvals)
  }

  /** Apply a trained whitening transform: PCA-project, then scale each
    * coordinate by 1/sqrt(lambda) so every retained direction carries
    * unit (sample) variance and the projected covariance is the
    * identity. Same codegen'd one-scan shape as [[pcaProject]]. */
  def whitenProject(emb: DataFrame, idCol: String, vecCol: String,
                    mean: Array[Double], components: Array[Array[Double]],
                    eigvals: Array[Double], eps: Double = 1e-12): DataFrame = {
    require(components.length == eigvals.length, "components/eigvals mismatch")
    val scale = eigvals.map(l => 1.0 / math.sqrt(math.max(l, eps)))
    pcaProject(emb, idCol, vecCol, mean, components)
      .select(col(idCol),
        zip_with(col(vecCol), lit(scale), (a, b) => a * b).as(vecCol))
  }

  /** Apply a trained PCA projection: center on the trained mean, then
    * fold each component — codegen'd zip_with/aggregate per output
    * dimension, one scan, no shuffle (the [[randomProject]] execution
    * shape with a learned matrix). */
  def pcaProject(emb: DataFrame, idCol: String, vecCol: String,
                 mean: Array[Double], components: Array[Array[Double]])
      : DataFrame = {
    val centered = zip_with(asDouble(col(vecCol)), lit(mean), (a, b) => a - b)
    val proj = array(components.map { row =>
      aggregate(zip_with(centered, lit(row), (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x)
    }.toIndexedSeq: _*)
    emb.select(col(idCol), proj.as(vecCol))
  }

  /** ANN via a PCA shortlist: candidates ranked by cosine in the trained
    * PCA space, then exact float re-rank — identical funnel shape to
    * [[rpTopK]] but with the data-adaptive projection, which reaches the
    * same recall at outDim=16 that JL needs 32 for on clustered corpora
    * (half the candidate-generation bytes again). */
  def pcaTopK(emb: DataFrame, idCol: String, vecCol: String,
              queryIds: Column => Column, k: Int,
              outDim: Int = 16, shortlist: Int = 0,
              maxTrainRows: Int = 2048): DataFrame = {
    val (mean, comps) = trainPcaProjection(emb, idCol, vecCol, outDim, maxTrainRows)
    pcaTopKServe(emb, idCol, vecCol, queryIds, k, mean, comps, shortlist)
  }

  /** [[pcaTopK]] with a FROZEN pre-trained projection — the serving
    * split: training happens once at index-build time, every query batch
    * pays only the projected shortlist + exact re-rank. */
  def pcaTopKServe(emb: DataFrame, idCol: String, vecCol: String,
                   queryIds: Column => Column, k: Int,
                   mean: Array[Double], components: Array[Array[Double]],
                   shortlist: Int = 0): DataFrame = {
    val sl = if (shortlist > 0) shortlist else 4 * k
    val short = bruteForceTopK(pcaProject(emb, idCol, vecCol, mean, components),
        idCol, vecCol, queryIds, sl)
      .select(col("query_id"), col("neighbor_id"))
    exactRerank(emb, idCol, vecCol, queryIds, short, k)
  }

  /** Truncated-dimension (matryoshka-style) serving tier: shortlist by
    * cosine over only the first `prefixDims` coordinates, then exact
    * float re-rank — the zero-training dimension-reduction funnel for
    * embeddings trained with Matryoshka Representation Learning
    * (Kusupati et al. 2022), where the leading coordinates carry most
    * of the signal by construction. Versus PCA this needs NO fitted
    * projection (nothing to train, persist, or drift), and the
    * truncated scan reads prefixDims/dim of the vector bytes — on a
    * column store the slice prunes I/O, the 100 TB win. Same
    * shortlist-fraction dial law as the PCA/PQ funnels. */
  def truncatedTopK(emb: DataFrame, idCol: String, vecCol: String,
                    queryIds: Column => Column, k: Int, prefixDims: Int,
                    shortlist: Int = 0): DataFrame = {
    require(prefixDims >= 1, s"prefixDims must be >= 1, got $prefixDims")
    val sl = if (shortlist > 0) shortlist else 4 * k
    val truncated = emb.select(col(idCol),
      slice(col(vecCol), 1, prefixDims).as(vecCol))
    val short = bruteForceTopK(truncated, idCol, vecCol, queryIds, sl)
      .select(col("query_id"), col("neighbor_id"))
    exactRerank(emb, idCol, vecCol, queryIds, short, k)
  }

  /** Maximal Marginal Relevance rerank (Carbonell & Goldstein, SIGIR'98)
    * — the diversity step of a retrieval stack: from a relevance-ranked
    * candidate list, greedily select `k` items, each step maximizing
    * lambda * rel - (1 - lambda) * max(cosine to already-selected).
    * Returns relevant-but-mutually-diverse results instead of k copies
    * of the same near-duplicate answer (the serving-side complement of
    * SemDeDup's corpus-side pruning).
    *
    * `cand` must carry (query_id, doc_id, rel); vectors join from `emb`.
    * The greedy loop is UNROLLED into k plan steps — each step scores
    * the remaining candidates against the selected set (a |Q|*step-row
    * broadcast), takes the per-query argmax via a window over the
    * |Q|*shortlist candidate frame, and anti-joins the pick out. All
    * Column expressions (codegen'd cosine, no UDF), deterministic:
    * mmr scores round to 6dp before comparison and ties break by
    * doc_id, so the selection is identical on any engine and cluster —
    * which is what lets the oracle replay the whole greedy trajectory
    * step for step. Cost: k windows over the candidate frame, fine for
    * serving-sized k; candidate GENERATION is the scale-bound stage and
    * stays with the ANN tiers.
    * Output: (query_id, doc_id, rank, mmr) with rank 1..k. */
  def mmrRerank(cand: DataFrame, emb: DataFrame, idCol: String,
                vecCol: String, k: Int, lambda: Double): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda in [0,1], got $lambda")
    val vecs = emb.select(col(idCol).as("doc_id"), asDouble(col(vecCol)).as("v"))
    var remaining = cand.select(col("query_id"), col("doc_id"), col("rel"))
      .join(vecs, Seq("doc_id"))
    var selected: DataFrame = null
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("mmr").desc, col("doc_id"))
    for (step <- 1 to k) {
      val scored =
        if (step == 1)
          remaining.withColumn("mmr", round(lit(lambda) * col("rel"), 6))
        else {
          val sel = broadcast(
            selected.select(col("query_id"), col("v").as("sv")))
          remaining.join(sel, Seq("query_id"))
            .groupBy(col("query_id"), col("doc_id"))
            .agg(first(col("rel")).as("rel"), first(col("v")).as("v"),
              max(cosine(col("v"), col("sv"))).as("max_sim"))
            .withColumn("mmr", round(lit(lambda) * col("rel")
              - lit(1.0 - lambda) * col("max_sim"), 6))
        }
      // localCheckpoint the per-step frames: without it the unrolled loop
      // hands Catalyst a quadratically deepening tree — step s re-plans
      // and RE-EXECUTES all s-1 prior steps (each a join+agg+window+
      // anti-join pipeline), so the k-step loop costs O(k²) stages and
      // the bench row was ~8 s of planning/replay for 200 rows of data.
      // `pick` is materialized eagerly (<= |Q| rows) so its plan runs
      // exactly once per step even though two frames consume it;
      // `remaining` is truncated so the anti-join chain never replays.
      // `selected` needs no checkpoint: it is a union of already-
      // materialized picks. Bit-identical output, O(k) stages total.
      val pick0 = scored
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("query_id"), col("doc_id"), lit(step.toLong).as("rank"),
          col("mmr"), col("v"))
      val pick = if (step < k) pick0.localCheckpoint(true) else pick0
      selected = if (step == 1) pick else selected.unionByName(pick)
      if (step < k) {
        remaining = remaining
          .join(pick.select(col("query_id"), col("doc_id")),
            Seq("query_id", "doc_id"), "left_anti")
          .localCheckpoint(true)
      }
    }
    selected.select(col("query_id"), col("doc_id"), col("rank"), col("mmr"))
  }

  /** All embedding pairs with cosine >= threshold (near-dup detection by
    * embedding). Brute-force all-pairs: O(n²) BY DEFINITION, so the input
    * size is ENFORCED (`maxInputRows`, default 10k ≈ 50M comparisons) —
    * exceeding it throws instead of silently launching a cluster-melting
    * nested loop. This is the recall oracle / bounded-verification tool;
    * [[lshNearDupPairs]] is the scale path. */
  def cosineNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                         threshold: Double,
                         maxInputRows: Long = 10000): DataFrame = {
    val e = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("vec"))
    // limit-probe instead of a full count: the guard must itself stay cheap
    // on the giant inputs it exists to reject
    val over = e.limit((maxInputRows + 1).min(Int.MaxValue).toInt).count() > maxInputRows
    require(!over,
      s"cosineNearDupPairs is all-pairs (O(n^2)); input exceeds " +
        s"maxInputRows=$maxInputRows. Use lshNearDupPairs for large inputs " +
        "or raise the bound explicitly.")
    e.as("a").join(e.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        cosine(col("a.vec"), col("b.vec")).as("cos_raw"))
      .filter(col("cos_raw") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("cos_raw"), 4).as("cosine"))
  }

  /** Cross-set semantic overlap — the EMBEDDING leg of benchmark
    * decontamination: flag every corpus vector whose max cosine against
    * ANY benchmark vector reaches `threshold`, reporting the argmax
    * benchmark id (catches the paraphrased near-copies that n-gram
    * overlap misses; pairs with [[graft.operators.Dedup.spanContaminated]]
    * the way published pipelines run both lexical and semantic checks).
    *
    * Scale shape: the benchmark side BROADCASTS (a held-out suite is
    * small by nature — guard-bounded like the all-pairs tools), the
    * corpus streams through one map-side probe per row, rows below the
    * threshold die at the scan, and only (id, bench_id, cos) scalars
    * from flagged rows reach the max-aggregate shuffle — corpus
    * embeddings never shuffle. The argmax is a struct-max with the
    * bench id NEGATED so cosine ties break to the LOWEST bench id,
    * mirroring the oracle's (cos DESC, bench_id) order. */
  def semanticContamination(corpus: DataFrame, bench: DataFrame,
      idCol: String, vecCol: String, threshold: Double,
      maxBenchRows: Long = 10000): DataFrame = {
    val b = bench.select(col(idCol).as("bench_id"), asDouble(col(vecCol)).as("bvec"))
    val over = b.limit((maxBenchRows + 1).min(Int.MaxValue).toInt).count() > maxBenchRows
    require(!over,
      s"semanticContamination broadcasts the benchmark side; input exceeds " +
        s"maxBenchRows=$maxBenchRows. Shard the benchmark or raise the bound " +
        "explicitly.")
    corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("vec"))
      .join(broadcast(b))
      .select(col("id"), col("bench_id"),
        cosine(col("vec"), col("bvec")).as("cos_raw"))
      .filter(col("cos_raw") >= threshold)
      .groupBy(col("id"))
      .agg(max(struct(col("cos_raw"), (-col("bench_id")).as("nid"))).as("m"))
      .select(col("id").as(idCol), (-col("m.nid")).as("bench_id"),
        round(col("m.cos_raw"), 4).as("cosine"))
  }

  /** Near-dup pairs by embedding at scale: random-hyperplane LSH candidate
    * generation (pairs sharing any of L table buckets — a bucket-local
    * equi-join, linear in corpus size) followed by EXACT cosine re-scoring,
    * so precision is 1 and only recall depends on (tables, nBits).
    * Candidates travel as bare id pairs; vectors re-join only for the
    * surviving candidates (the shuffle carries ids, not embeddings).
    * Output matches [[cosineNearDupPairs]]: (a_id, b_id, cosine). */
  def lshNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                      threshold: Double,
                      tables: Int = 8, nBits: Int = 6, seed: Long = 42L): DataFrame = {
    val dim = vecDim(emb, vecCol).getOrElse(
      return emb.select(col(idCol).as("a_id"), col(idCol).as("b_id"),
        lit(0.0).as("cosine")).limit(0))
    val planes = hyperplanes(tables, nBits, dim, seed)
    val banded = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("vec"))
      .select(col("id"), posexplode(
        graft.functions.LshBits.lshBits(col("vec"), planes)).as(Seq("t", "b")))
      .select(col("id"), struct(col("t"), col("b")).as("tb"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.tb") === col("b.tb") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .distinct() // a pair can collide in several tables
    val vecs = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("vec"))
    cand
      .join(vecs.as("va"), col("a_id") === col("va.id"))
      .join(vecs.as("vb"), col("b_id") === col("vb.id"))
      .select(col("a_id"), col("b_id"),
        cosine(col("va.vec"), col("vb.vec")).as("cos_raw"))
      .filter(col("cos_raw") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("cos_raw"), 4).as("cosine"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — the published
    * embedding-space dedup recipe for LLM corpora): k-means the embedding
    * space, then drop within-cluster items whose cosine to an already-kept
    * item clears the threshold, keeping one representative per duplicate
    * neighborhood. The clustering is what makes this tractable at corpus
    * scale — the quadratic comparison runs per cell (~n/k rows each),
    * never across the whole corpus, so total work is n²/k and the operator
    * scales by raising `nCentroids` with corpus size (k ≈ n / targetCell
    * keeps per-cell work constant; the paper uses 110k clusters for
    * LAION). Retention is the id-ordered greedy maximal independent set of
    * each cell's threshold graph — exactly the paper's sequential sweep
    * with min-id representatives (the paper keeps a random/low-centroid
    * member; documented divergence). This gives the two guarantees the
    * gate replays: no two KEPT items in a cell are near-dups, and every
    * DROPPED item has a direct near-dup among the kept (its keeper) —
    * transitive-closure labeling (connectedComponents) would violate the
    * second on chains, which is why dedup here is NOT the MinHash funnel.
    *
    * Spark shape: centroids are trained once ([[trainIvfCentroids]] —
    * deterministic), broadcast as literals inside the one-pass
    * [[graft.functions.NearestCells]] argmax, so cell assignment is a
    * zero-shuffle scan. The only corpus shuffle is the groupByKey on cell
    * id; the per-cell greedy sweep is local, O(cell²·dim) worst case with
    * first-match early exit, and per-group memory is cell-bounded by
    * design (the nCentroids dial). Dot products accumulate sequentially —
    * the identical IEEE operation order as [[VecDot]]/[[cosine]] — so the
    * gate's Column-space replay reproduces the same doubles bit-for-bit.
    *
    * Rows with null/empty vectors are kept (nothing to compare), cell -1.
    * Output: (id, cell, kept, keeper_id) — keeper_id = own id for kept
    * rows, the retained near-dup for dropped rows. */
  def semDedup(emb: DataFrame, idCol: String, vecCol: String,
               threshold: Double, nCentroids: Int = 16,
               lloydIters: Int = 2): DataFrame =
    semDedupServe(emb, idCol, vecCol, threshold,
      trainCentroids(emb, idCol, vecCol, nCentroids, lloydIters))

  /** [[semDedup]] against FROZEN centroids (see [[trainIvfCentroids]]). */
  def semDedupServe(emb: DataFrame, idCol: String, vecCol: String,
                    threshold: Double, centroids: Seq[Seq[Double]]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val ids = emb.select(col(idCol).cast("long").as("id"),
      asDouble(col(vecCol)).as("v"))
    if (centroids.isEmpty)
      // empty/degenerate corpus: everything kept, no cells
      return ids.select(col("id"), lit(-1).as("cell"), lit(true).as("kept"),
        col("id").as("keeper_id"))

    val assigned = ids.withColumn("cell",
      when(col("v").isNotNull && size(col("v")) > 0,
        graft.functions.NearestCells.nearestCells(col("v"), centroids, 1)
          .getItem(0))
        .otherwise(lit(-1)))

    // the unassignable rows bypass the grouped sweep untouched
    val passthrough = assigned.filter(col("cell") < 0)
      .select(col("id"), col("cell"), lit(true).as("kept"),
        col("id").as("keeper_id"))

    val swept = assigned.filter(col("cell") >= 0)
      .select(col("id"), col("cell"), col("v"))
      .as[SemDedupRow]
      .groupByKey(_.cell)
      .flatMapGroups((cell, it) => SemDedupRow.greedySweep(cell, it, threshold))
      .toDF()

    swept.unionByName(passthrough)
  }

  /** Hard correctness gate for [[semDedup]] in the house verdict style
    * (see [[recallGate]]): one row per corpus id with a boolean the oracle
    * pins `true`. `sem_ok` asserts the decision is internally sound —
    *  - dropped rows: the keeper is itself KEPT, lives in the same cell,
    *    and the exact cosine between the row and its keeper clears the
    *    threshold (the drop is justified by a genuinely-close retained
    *    representative);
    *  - kept rows: no OTHER kept row in the same cell clears the threshold
    *    (the greedy sweep produced a true independent set — two surviving
    *    near-dups mean the sweep broke).
    * Both verdicts recompute the identical [[cosine]] expression the
    * operator filtered on, so they are exact replays, not epsilon checks.
    * With deterministic centroids the whole frame is deterministic; any
    * regression in cell assignment, pair generation, or component
    * resolution flips rows to false and hash-mismatches the gate. */
  def semDedupGate(emb: DataFrame, idCol: String, vecCol: String,
                   threshold: Double, nCentroids: Int = 16): DataFrame = {
    val res = semDedup(emb, idCol, vecCol, threshold, nCentroids)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val vecs = emb.select(col(idCol).cast("long").as("id"),
        asDouble(col(vecCol)).as("v"))
      val withV = res.join(vecs, Seq("id"))

      // dropped: keeper kept + same cell + exact cosine >= threshold
      val keepers = withV.filter(col("kept"))
        .select(col("id").as("keeper_id"), col("cell").as("k_cell"),
          col("v").as("kv"), lit(true).as("k_kept"))
      val droppedOk = withV.filter(!col("kept"))
        .join(keepers, Seq("keeper_id"), "left")
        .select(col("id"),
          (coalesce(col("k_kept"), lit(false)) &&
            col("k_cell") === col("cell") &&
            cosine(col("v"), col("kv")) >= threshold).as("sem_ok"))

      // kept: no other kept row in the same cell above threshold
      val keptRows = withV.filter(col("kept") && col("cell") >= 0)
        .select(col("cell"), col("id"), col("v"))
      val violators = keptRows.as("a").join(keptRows.as("b"),
          col("a.cell") === col("b.cell") && col("a.id") =!= col("b.id"))
        .filter(cosine(col("a.v"), col("b.v")) >= threshold)
        .select(col("a.id").as("id")).distinct()
      val keptOk = res.filter(col("kept"))
        .join(violators.withColumn("bad", lit(true)), Seq("id"), "left")
        .select(col("id"), col("bad").isNull.as("sem_ok"))

      droppedOk.unionByName(keptOk).orderBy(col("id"))
        .select(col("id").as("vec_id"), col("sem_ok"))
    } finally res.unpersist(blocking = false)
  }

  // ---------------------------------------------------------------------
  // Cluster assignment + cluster-balanced selection
  // ---------------------------------------------------------------------

  /** Deterministic nearest-centroid cluster assignment: each vector maps
    * to the centroid with the highest cosine (ties broken by smallest
    * centroid id). Centroids arrive as a bounded driver-side list (the
    * K-side of k-means — KBs even at k=65536) and ship to executors inside
    * the compiled [[graft.functions.NearestCells]] expression, so the scan
    * is map-only: no shuffle, no join, one tight dot-product loop per row.
    *
    * This is the assignment primitive under cluster-balanced data curation
    * (DataComp/DCLM-style: cluster the corpus, then cap or re-weight per
    * cluster) and is the same compiled kernel the IVF index uses for cell
    * routing — one code path, two products.
    *
    * Output: (idCol, cluster_id, cosine) with cosine rounded to 4dp.
    */
  def assignClusters(emb: DataFrame, idCol: String, vecCol: String,
                     centroids: Seq[(Long, Seq[Double])]): DataFrame = {
    require(centroids.nonEmpty, "no centroids")
    val sorted = centroids.sortBy(_._1)
    val cents = sorted.map(_._2)
    val ids = sorted.map(_._1)
    val cidx = graft.functions.NearestCells
      .nearestCells(asDouble(col(vecCol)), cents, nProbe = 1)(0)
    val matrix = typedLit(cents)
    val idTable = typedLit(ids)
    emb
      .withColumn("_cidx", cidx)
      .select(
        col(idCol),
        element_at(idTable, col("_cidx") + 1).as("cluster_id"),
        round(cosine(asDouble(col(vecCol)),
          element_at(matrix, col("_cidx") + 1)), 4).as("cosine"))
  }

  /** Cluster-balanced cap: assign clusters, keep the first `cap` members
    * per cluster in id order, and report the per-cluster audit frame
    * (members, kept, kept-id checksum). One corpus shuffle — the
    * per-cluster window and the audit agg share the cluster key, so
    * Catalyst reuses the exchange. */
  def clusterBalance(emb: DataFrame, idCol: String, vecCol: String,
                     centroids: Seq[(Long, Seq[Double])], cap: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id")).orderBy(col(idCol))
    assignClusters(emb, idCol, vecCol, centroids)
      .withColumn("rn", row_number().over(w))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
        sum(when(col("rn") <= cap, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rn") <= cap, col(idCol))).as("kept_id_sum"))
  }

  // ---------------------------------------------------------------------
  // Margin-based bitext / pair mining
  // ---------------------------------------------------------------------

  /** Margin-based candidate pair mining between two embedding sets
    * (Artetxe & Schwenk 2019, "Margin-based Parallel Corpus Mining with
    * Multilingual Sentence Embeddings" — the LASER/CCMatrix recipe):
    * raw cosine over-selects hubs (vectors close to everything), so each
    * pair is scored by its cosine divided by the mean of the two sides'
    * top-k cosine neighborhoods,
    *
    *   margin(x, y) = cos(x, y) / ((avgTopK(x) + avgTopK(y)) / 2),
    *
    * and each source vector keeps its best-margin target when the margin
    * clears `threshold` (the "max" strategy).
    *
    * Float discipline (the Entropy pattern): cosines round to 6dp, the
    * top-k means are exact DECIMAL(18,6) sums divided once in double
    * space, so margins are bit-identical on any partitioning and to the
    * DuckDB oracle. This exact formulation is gate-sized (all-pairs); the
    * 100 TB path swaps the all-pairs cosine frame for an IVF/LSH shortlist
    * exactly like [[cosineNearDupPairs]] vs [[lshNearDupPairs]] — the
    * margin math downstream is unchanged.
    */
  def marginPairs(src: DataFrame, tgt: DataFrame, idCol: String,
                  vecCol: String, k: Int, threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = src.select(col(idCol).cast("long").as("x"), asDouble(col(vecCol)).as("av"))
    val b = tgt.select(col(idCol).cast("long").as("y"), asDouble(col(vecCol)).as("bv"))
    // The pair frame is consumed three times (ka, kb, margins); it stays
    // unmaterialized — a broadcast nested-loop re-scan is cheaper than
    // caching at gate size, and the 100 TB path materializes its shortlist
    // frame instead.
    val pairs = a.join(broadcast(b))
      .select(col("x"), col("y"), round(cosine(col("av"), col("bv")), 6).as("c"))
    def topKMean(key: String, other: String, outCol: String) = {
      val w = Window.partitionBy(col(key)).orderBy(col("c").desc, col(other))
      pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .groupBy(col(key))
        .agg((sum(col("c").cast("decimal(18,6)")).cast("double") / count(lit(1)))
          .as(outCol))
    }
    val ka = topKMean("x", "y", "ax")
    val kb = topKMean("y", "x", "ay")
    val margins = pairs
      .join(ka, "x").join(kb, "y")
      .withColumn("margin", col("c") / ((col("ax") + col("ay")) / 2))
    val w = Window.partitionBy(col("x")).orderBy(col("margin").desc, col("y"))
    margins.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("margin") >= threshold)
      .select(col("x").as("src_id"), col("y").as("tgt_id"),
        round(col("margin"), 4).as("margin_r"))
  }

  /** The 100 TB path of [[marginPairs]]: candidate pairs come from an
    * IVF cell-bucketed equi-join (each source vector probes its nProbe
    * nearest cells, each target sits in its home cell) instead of the
    * all-pairs frame, and the margin's top-k neighborhood means are
    * computed over the candidate set — the same construction the
    * published mining runs use (LASER/CCMatrix compute margins from
    * faiss ANN neighbor lists, not exact neighborhoods). Same downstream
    * margin math, argmax, and threshold as the exact operator.
    *
    * Honest operating envelope, MEASURED on the fixture embeddings: on
    * SEPARABLE data — true pairs well above the noise floor, i.e. what
    * real aligned corpora look like — the funnel recovers the full
    * planted alignment with zero false pairs (the engine gate pins
    * 300/300 at every SF with nProbe=4 of 16). On NON-separable
    * isotropic noise, where margins crowd the decision band near 1.0,
    * candidate-set neighborhood means perturb the margins enough that
    * only ~50-65% of the exact operator's picks agree regardless of
    * probing — threshold mining in that regime needs the exact
    * all-pairs formulation ([[marginPairs]]), not a funnel. Cost shape:
    * one compiled cell-routing pass per side + a cell-keyed equi-join —
    * never a cross join. */
  def marginPairsIvf(src: DataFrame, tgt: DataFrame, idCol: String,
                     vecCol: String, k: Int, threshold: Double,
                     centroids: Seq[Seq[Double]], nProbe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val probe = graft.functions.NearestCells
      .nearestCells(asDouble(col(vecCol)), centroids, nProbe)
    val home = graft.functions.NearestCells
      .nearestCells(asDouble(col(vecCol)), centroids, 1)(0)
    val a = src.select(col(idCol).cast("long").as("x"),
        asDouble(col(vecCol)).as("av"), explode(probe).as("cell"))
    val b = tgt.select(col(idCol).cast("long").as("y"),
        asDouble(col(vecCol)).as("bv"), home.as("cell"))
    val pairs = a.join(b, "cell")
      .select(col("x"), col("y"), round(cosine(col("av"), col("bv")), 6).as("c"))
      .distinct() // a (x, y) pair can meet in several probed cells
    def topKMean(key: String, other: String, outCol: String) = {
      val w = Window.partitionBy(col(key)).orderBy(col("c").desc, col(other))
      pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .groupBy(col(key))
        .agg((sum(col("c").cast("decimal(18,6)")).cast("double") / count(lit(1)))
          .as(outCol))
    }
    val margins = pairs
      .join(topKMean("x", "y", "ax"), "x")
      .join(topKMean("y", "x", "ay"), "y")
      .withColumn("margin", col("c") / ((col("ax") + col("ay")) / 2))
    val w = Window.partitionBy(col("x")).orderBy(col("margin").desc, col("y"))
    margins.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("margin") >= threshold)
      .select(col("x").as("src_id"), col("y").as("tgt_id"),
        round(col("margin"), 4).as("margin_r"))
  }
}
