package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — the dataset-versioning audit between two corpus
  * versions: which documents were ADDED, REMOVED, or CHANGED (same id,
  * different content), and how many are UNCHANGED. Training-data
  * governance runs this between every crawl refresh and the corpus it
  * replaces: an unexpected removal count catches an upstream filter
  * regression before it silently shifts the mix; changed-content
  * fingerprints feed the incremental dedup/index-update paths.
  *
  * Content comparison uses md5 fingerprints (engine-portable, the
  * repo-wide idiom), so the diff never moves document text through the
  * join — each side reduces to (id, 16-byte fingerprint) at the scan
  * before the single full-outer equi-join on id, which is the one
  * shuffle and co-partitions both sides. At 100 TB the shuffled bytes
  * are ~24 bytes/doc, not the corpus.
  */
object SnapshotDiff {

  /** Per-document diff rows: (idCol, status in
    * {added, removed, changed, unchanged}). */
  def diff(before: DataFrame, after: DataFrame, idCol: String,
           contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "diff needs at least one content column")
    // presence flags, not fingerprint nullness, decide added/removed —
    // a row with NULL content would otherwise masquerade as missing
    def fp(df: DataFrame, suffix: String): DataFrame =
      df.select(col(idCol),
        md5(concat_ws(" ", contentCols.map(col): _*)).as(s"__fp$suffix"),
        lit(1).as(s"__in$suffix"))
    fp(before, "_a").join(fp(after, "_b"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__in_a").isNull, "added")
          .when(col("__in_b").isNull, "removed")
          .when(!(col("__fp_a") <=> col("__fp_b")), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Compact audit summary: one row per status with count and id
    * bounds — the shape a pipeline gate alerts on. */
  def summary(before: DataFrame, after: DataFrame, idCol: String,
              contentCols: Seq[String]): DataFrame =
    diff(before, after, idCol, contentCols)
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n"),
        min(col(idCol)).as("min_id"), max(col(idCol)).as("max_id"))
}
