package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-document Shannon entropy signals — the information-density
  * quality discriminators (low char entropy = keyboard mash / repeated
  * runs; low token entropy = boilerplate): character-level and
  * token-level H = -Σ p·log2 p in bits, over the whitespace-normalized
  * text.
  *
  * Scale shape: one explode per granularity, counts fold map-side into
  * (doc, symbol) cells, and each entropy term rounds to 8dp before an
  * exact DECIMAL sum — order-independent, so the answer is identical on
  * any partitioning and bit-replayable by the SQL oracle. Shuffles are
  * doc-keyed only. */
object Entropy {

  /** (idCol, n_chars_h, char_entropy, n_tokens_h, token_entropy);
    * entropies round-6 bits, 0.0 for empty/degenerate docs. */
  def signals(df: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    val dec = DecimalType(18, 8)
    val id = col(idCol)
    val norm = df.select(id, TextAnalysis.normText(col(textCol)).as("tn"))

    def entropyOf(sym: DataFrame, nName: String, hName: String): DataFrame = {
      // totals via an unordered window over the counts frame instead of
      // a self-join: one (id,s) exchange + one id exchange total, and
      // the trailing groupBy reuses the window's id partitioning
      val w = org.apache.spark.sql.expressions.Window.partitionBy(id)
      sym.groupBy(id, col("s")).agg(count(lit(1)).as("cnt"))
        .withColumn("n", sum(col("cnt")).over(w))
        .select(id,
          col("n"),
          round((col("cnt").cast("double") / col("n")) *
            log2(col("cnt").cast("double") / col("n")), 8).cast(dec).as("term"))
        .groupBy(id)
        // negate AND round in DECIMAL space, cast to double last:
        // decimals carry no -0.0, and a .xxxxxx50 sum rounds exactly
        // (HALF_UP) where double-space rounding flips on the binary
        // representation (caught by the first sf0.01 run: 4.04736450)
        .agg(first(col("n")).as(nName),
          round(sum(col("term")) * lit(-1), 6).cast("double").as(hName))
    }

    val chars = entropyOf(
      norm.select(id, explode(split(col("tn"), "")).as("s"))
        .filter(length(col("s")) > 0),
      "n_chars_h", "char_entropy")
    val tokens = entropyOf(
      norm.select(id, explode(split(col("tn"), " ")).as("s"))
        .filter(length(col("s")) > 0),
      "n_tokens_h", "token_entropy")

    // left join from the full doc set so empty docs surface with zeros
    df.select(id)
      .join(chars, Seq(idCol), "left")
      .join(tokens, Seq(idCol), "left")
      .select(id,
        coalesce(col("n_chars_h"), lit(0L)).as("n_chars_h"),
        coalesce(col("char_entropy"), lit(0.0)).as("char_entropy"),
        coalesce(col("n_tokens_h"), lit(0L)).as("n_tokens_h"),
        coalesce(col("token_entropy"), lit(0.0)).as("token_entropy"))
  }
}
