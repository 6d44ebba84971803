package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-correct contiguous global row-id assignment.
  *
  * Every training-data pipeline eventually needs a dense 0..N-1 id per
  * example (shard addressing, example-order seeds, packed-sequence
  * bookkeeping). The naive formulation — `row_number()` over a window with
  * no PARTITION BY — funnels the ENTIRE corpus through one task and is the
  * single most common scale-killer in ported pipelines. This operator
  * produces the identical assignment with the shuffle-parallel scheme every
  * distributed engine uses internally (Spark's own `zipWithIndex` does the
  * same two-phase trick at the RDD level):
  *
  *   1. range-repartition by the order key, sort within partitions —
  *      partition p holds a contiguous slice of the global order;
  *   2. count rows per partition (a #partitions-row aggregate — KBs);
  *   3. prefix-sum those counts into per-partition offsets with a window
  *      over the TINY counts frame (single-partition, but #partitions rows,
  *      never corpus rows);
  *   4. broadcast-join offsets back and add the within-partition
  *      `row_number` (window partitioned BY partition id — every window
  *      partition is one task's slice, maximal parallelism).
  *
  * No driver-side collect anywhere; the only single-partition stage is the
  * offsets prefix-sum over one row per shuffle partition. The caller must
  * supply a total order (include a unique tiebreaker column) — otherwise
  * ids within a tie group are partition-placement-dependent.
  *
  * At 100 TB: one range shuffle of the data (which a downstream
  * sorted-write wants anyway), one tiny agg, one broadcast. The id column
  * is BIGINT; assignment is deterministic for a deterministic input, so
  * re-runs and AQE re-plans produce the same ids.
  */
object GlobalIds {

  /** Append a dense 0..N-1 `gidCol` following the total order `order`.
    *
    * The range-partitioned frame is MATERIALIZED (persist + count) before
    * the counts branch and the data branch consume it. This is not an
    * optimization but a correctness requirement: `repartitionByRange`
    * computes its boundaries from a SAMPLE of the child, and when the
    * child is an exchange output (an aggregation, a prior join) its
    * intra-partition row order is nondeterministic — two independent
    * materializations of the "same" range exchange can sample different
    * rows, land on different boundaries, and hand the offsets branch a
    * partitioning the data branch doesn't have (measured: permuted ids on
    * an aggregated input; a parquet-scan input never trips it because its
    * row order is stable). One materialization pins boundaries, contents,
    * and partition ids for every consumer. The cost class is the same as
    * `RDD.zipWithIndex`'s extra pass; MEMORY_AND_DISK spills rather than
    * OOMs at scale, and a downstream sorted write wants this layout
    * anyway.
    *
    * @param order      total-order sort key (must be unique per row)
    * @param partitions explicit range-partition count (explicit so AQE
    *                   cannot re-coalesce differently between the counts
    *                   branch and the data branch)
    */
  def assign(df: DataFrame, order: Seq[Column], gidCol: String = "gid",
             partitions: Int = 0): DataFrame = {
    val parts =
      if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df
      .repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("_graft_pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ranged.count() // force ONE materialization before the branches read it

    // #partitions-row frame: count per slice, prefix-sum to offsets.
    val counts = ranged.groupBy(col("_graft_pid").as("_graft_off_pid"))
      .agg(count(lit(1)).as("_graft_cnt"))
    val offW = Window.orderBy(col("_graft_off_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("_graft_off", coalesce(sum(col("_graft_cnt")).over(offW), lit(0L)))
      .select(col("_graft_off_pid"), col("_graft_off"))

    val inPartW = Window.partitionBy(col("_graft_pid")).orderBy(order: _*)
    ranged
      .join(broadcast(offsets), col("_graft_pid") === col("_graft_off_pid"))
      .withColumn(gidCol, col("_graft_off") + row_number().over(inPartW) - 1)
      .drop("_graft_pid", "_graft_off_pid", "_graft_off")
  }
}
