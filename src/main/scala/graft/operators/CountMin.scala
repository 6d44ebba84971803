package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005, "An improved data
  * stream summary: the count-min sketch and its applications") as a
  * RELATION rather than an opaque blob: the sketch is the
  * <= depth*width-row counter table itself, built by one
  * map-side-combined groupBy over the term stream. This is the
  * Spark-native shape for a mergeable frequency summary:
  *
  *  - BUILD is a single shuffle whose width is bounded by depth*width
  *    GROUPS regardless of corpus size — partial aggregation folds each
  *    partition's terms into <= depth*width partial counters before the
  *    exchange, the same economics as a bespoke UDAF buffer without the
  *    buffer code;
  *  - MERGE of two sketches is union + re-sum (counter tables are
  *    element-wise additive), so per-day sketches roll up to per-month
  *    with plain relational algebra — no binary-format versioning;
  *  - ESTIMATE is min over the depth row-counters for a term's buckets:
  *    a broadcast join of the tiny counter table against the query
  *    terms.
  *
  * Guarantees (for stream length N): est >= true always (counters only
  * over-count), and est <= true + eps*N with probability >= 1-delta at
  * width = ceil(e/eps), depth = ceil(ln(1/delta)).
  *
  * Bucket hashes are the engine-portable row-salted md5 prefix (the
  * established cross-engine idiom), so an external system — the DuckDB
  * oracle here — replays every counter and every estimate bit-for-bit;
  * the correctness gate needs no tolerance band. Completes the
  * mergeable-sketch family next to HLL distinct (q24), the quantile
  * sketch (q29), and Misra-Gries heavy hitters (text_heavy_hitters):
  * Misra-Gries answers "which items are frequent" during the scan;
  * Count-Min answers "how frequent is THIS item" for items chosen
  * after it. */
object CountMin {

  /** Row-salted portable bucket hash in [0, width). */
  def bucket(term: Column, row: Int, width: Int): Column =
    conv(substring(md5(concat(lit(row.toString + ":"), term)), 1, 8), 16, 10)
      .cast("long") % width

  private def rowBuckets(termCol: String, depth: Int, width: Int): Column =
    array((0 until depth).map(i =>
      struct(lit(i).as("row"), bucket(col(termCol), i, width).as("bucket"))): _*)

  /** depth x width counter table (row, bucket, n) over a term column.
    * All-zero counters are simply absent; [[estimate]] coalesces them
    * back to 0. */
  def sketch(terms: DataFrame, termCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1, s"depth must be >= 1, got $depth")
    require(width >= 1, s"width must be >= 1, got $width")
    terms.select(explode(rowBuckets(termCol, depth, width)).as("rb"))
      .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Point estimates for `queries` (one term per row): min over the
    * depth bucket counters, 0 for never-seen terms. The counter table
    * is <= depth*width rows by construction and broadcasts. */
  def estimate(sk: DataFrame, queries: DataFrame, termCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1, s"depth must be >= 1, got $depth")
    require(width >= 1, s"width must be >= 1, got $width")
    queries.select(col(termCol), explode(rowBuckets(termCol, depth, width)).as("rb"))
      .select(col(termCol), col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .join(broadcast(sk), Seq("row", "bucket"), "left_outer")
      .groupBy(col(termCol))
      .agg(min(coalesce(col("n"), lit(0L))).as("n_est"))
  }
}
