package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-level document quality signals — the Gopher line-repetition
  * rules (Rae et al. 2021, Table A1) shared by MassiveText, RefinedWeb
  * and FineWeb: fraction of lines that duplicate an earlier line,
  * fraction of CHARACTERS inside those duplicate lines, fraction of
  * lines ending in an ellipsis, fraction of bullet-point lines — plus
  * the published keep-thresholds (dup lines <= 30%, dup chars <= 20%,
  * ellipsis lines <= 30%, bullet lines <= 90%).
  *
  * Complements [[Repetition]] (token n-gram repetition) at line
  * granularity. Scale shape: one posexplode, one (doc, line) aggregate,
  * one doc aggregate — doc-keyed shuffles only; ratios round 4dp so the
  * SQL oracle replays them exactly.
  */
object LineQuality {

  /** (idCol, n_lines, dup_line_frac, dup_char_frac, ellipsis_frac,
    * bullet_frac, keep_doc). */
  def signals(df: DataFrame, idCol: String = "doc_id",
              textCol: String = "text",
              maxDupLineFrac: Double = 0.3, maxDupCharFrac: Double = 0.2,
              maxEllipsisFrac: Double = 0.3, maxBulletFrac: Double = 0.9): DataFrame = {
    val id = col(idCol)
    val lines = df
      .select(id, posexplode(split(coalesce(col(textCol), lit("")), "\n"))
        .as(Seq("pos", "raw")))
      .select(id, TextAnalysis.normText(col("raw")).as("ln"))
      .withColumn("is_ellipsis",
        (col("ln").endsWith("...") || col("ln").endsWith("…")).cast("long"))
      .withColumn("is_bullet",
        (col("ln").startsWith("- ") || col("ln").startsWith("* ") ||
          col("ln").startsWith("• ")).cast("long"))
    // per distinct (doc, line): occurrence count + per-line stats;
    // duplicates-beyond-first carry the dup fractions
    val perLine = lines.groupBy(id, col("ln"))
      .agg(count(lit(1)).as("cnt"),
        first(col("is_ellipsis")).as("is_ellipsis"),
        first(col("is_bullet")).as("is_bullet"))
      .withColumn("len", length(col("ln")).cast("long"))
    perLine.groupBy(id)
      .agg(
        sum(col("cnt")).as("n_lines"),
        sum(col("cnt") * col("len")).as("n_chars"),
        sum(col("cnt") - 1).as("n_dup_lines"),
        sum((col("cnt") - 1) * col("len")).as("n_dup_chars"),
        sum(col("cnt") * col("is_ellipsis")).as("n_ellipsis"),
        sum(col("cnt") * col("is_bullet")).as("n_bullet"))
      .select(id,
        col("n_lines"),
        round(col("n_dup_lines").cast("double") / col("n_lines"), 4)
          .as("dup_line_frac"),
        round(col("n_dup_chars").cast("double") /
          greatest(col("n_chars"), lit(1L)), 4).as("dup_char_frac"),
        round(col("n_ellipsis").cast("double") / col("n_lines"), 4)
          .as("ellipsis_frac"),
        round(col("n_bullet").cast("double") / col("n_lines"), 4)
          .as("bullet_frac"))
      .withColumn("keep_doc",
        col("dup_line_frac") <= maxDupLineFrac &&
          col("dup_char_frac") <= maxDupCharFrac &&
          col("ellipsis_frac") <= maxEllipsisFrac &&
          col("bullet_frac") <= maxBulletFrac)
  }
}
