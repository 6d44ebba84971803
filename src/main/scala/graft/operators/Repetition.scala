package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gopher-style repetition signals (Rae et al. 2021, Table A1; the same
  * recipe ships in today's public curation stacks, e.g. RefinedWeb and
  * NVIDIA/HF curators): documents whose text is dominated by a repeated
  * n-gram are boilerplate/spam and get filtered before training.
  *
  * Two rule families over the whitespace-normalized, lowercased token
  * stream:
  *  - top n-gram fraction (n = 2, 3, 4): characters claimed by the single
  *    most frequent n-gram — occurrence count × gram length / text length
  *    (the published overlap-blind accounting);
  *  - duplicated n-gram fraction (n = 5 stands in for the paper's 5..10
  *    band): fraction of characters covered by ANY n-gram that occurs
  *    more than once, counted WITHOUT double-counting overlaps — an
  *    interval union ("char masking") exactly as the public
  *    implementations do it.
  *
  * Spark shape: ONE posexplode of the token stream; n-grams come from
  * window `lead`s over (doc, pos) — codegen'd, no interpreted
  * higher-order lambdas — and the same window supplies the token-length
  * prefix sums. The overlap union runs in TOKEN space (occurrence of an
  * n-gram at pos covers tokens [pos, pos+n)): a gaps-and-islands sweep
  * (the [[Sessionize]] pattern) merges overlapping occurrence intervals,
  * and each merged island converts to characters via the prefix sums
  * (covered chars = lens(island tokens) + internal spaces). Every step is
  * an aggregation or window over doc-keyed partitions — one shuffle key
  * end to end, linear in corpus size, and expressible term-for-term in
  * ANSI SQL for the oracle. */
object Repetition {

  /** Per-document repetition signals:
    * (id, n_tokens, top2_frac, top3_frac, top4_frac, dup5_chars,
    * dup5_frac). Documents shorter than n tokens score 0 for that rule. */
  def signals(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = TextAnalysis.normText(lower(col(textCol)))
    val base = docs.select(col(idCol).as("id"), norm.as("norm"))
      .withColumn("toks", split(col("norm"), " "))
      .withColumn("total_chars", length(col("norm")))

    val wp = Window.partitionBy(col("id")).orderBy(col("pos"))
    val toked = base
      .select(col("id"), col("total_chars"),
        posexplode(col("toks")).as(Seq("pos", "tok")))
      .withColumn("tok_len", length(col("tok")))
      // cum(pos) = total characters of tokens 0..pos inclusive
      .withColumn("cum", sum(col("tok_len")).over(
        wp.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("t1", lead(col("tok"), 1).over(wp))
      .withColumn("t2", lead(col("tok"), 2).over(wp))
      .withColumn("t3", lead(col("tok"), 3).over(wp))
      .withColumn("t4", lead(col("tok"), 4).over(wp))

    // top n-gram fraction for one n: count occurrences per gram, take the
    // deterministic top (count desc, gram length desc, gram asc), convert
    // to chars overlap-blind (count * len / total)
    def topFrac(gramCol: Column, out: String): DataFrame = {
      val grams = toked.filter(gramCol.isNotNull)
        .select(col("id"), col("total_chars"), gramCol.as("gram"))
        .groupBy(col("id"), col("total_chars"), col("gram"))
        .agg(count(lit(1)).as("c"))
      val rk = Window.partitionBy(col("id")).orderBy(
        col("c").desc, length(col("gram")).desc, col("gram").asc)
      grams.withColumn("rk", row_number().over(rk))
        .filter(col("rk") === 1)
        .select(col("id"),
          round(col("c") * length(col("gram")) /
            col("total_chars").cast("double"), 4).as(out))
    }

    val top2 = topFrac(
      when(col("t1").isNotNull, concat_ws(" ", col("tok"), col("t1"))),
      "top2_frac")
    val top3 = topFrac(
      when(col("t2").isNotNull,
        concat_ws(" ", col("tok"), col("t1"), col("t2"))),
      "top3_frac")
    val top4 = topFrac(
      when(col("t3").isNotNull,
        concat_ws(" ", col("tok"), col("t1"), col("t2"), col("t3"))),
      "top4_frac")

    // duplicated-5-gram char coverage: occurrences of grams with count>1
    // become token intervals [pos, pos+5), merged by the gaps-and-islands
    // sweep, then converted to characters via the cum prefix sums
    val g5 = toked.filter(col("t4").isNotNull)
      .select(col("id"), col("pos"),
        concat_ws(" ", col("tok"), col("t1"), col("t2"), col("t3"),
          col("t4")).as("gram"))
    val dupOcc = g5.withColumn("c",
        count(lit(1)).over(Window.partitionBy(col("id"), col("gram"))))
      .filter(col("c") > 1)
      .select(col("id"), col("pos").as("s"), (col("pos") + 5).as("e"))
    val ws = Window.partitionBy(col("id")).orderBy(col("s"))
    val islands = dupOcc
      .withColumn("prev_max_e", max(col("e")).over(
        ws.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("brk",
        when(col("prev_max_e").isNull || col("s") > col("prev_max_e"), 1)
          .otherwise(0))
      .withColumn("island", sum(col("brk")).over(
        ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("id"), col("island"))
      .agg(min(col("s")).as("is_s"), max(col("e")).as("is_e"))
    // chars([s, e)) = cum(e - 1) - (cum(s) - len(s)) + (e - s - 1) spaces
    val cums = toked.select(col("id"), col("pos"), col("tok_len"), col("cum"))
    val dupChars = islands
      .join(cums.select(col("id"), col("pos").as("is_s"),
        col("tok_len").as("s_len"), col("cum").as("s_cum")), Seq("id", "is_s"))
      .join(cums.select(col("id"), (col("pos") + 1).as("is_e"),
        col("cum").as("e_cum")), Seq("id", "is_e"))
      .select(col("id"),
        (col("e_cum") - col("s_cum") + col("s_len") +
          (col("is_e") - col("is_s") - 1)).as("chars"))
      .groupBy(col("id"))
      .agg(sum(col("chars")).as("dup5_chars"))

    base.select(col("id"), size(col("toks")).cast("long").as("n_tokens"),
        col("total_chars"))
      .join(top2, Seq("id"), "left")
      .join(top3, Seq("id"), "left")
      .join(top4, Seq("id"), "left")
      .join(dupChars, Seq("id"), "left")
      .select(col("id"), col("n_tokens"),
        coalesce(col("top2_frac"), lit(0.0)).as("top2_frac"),
        coalesce(col("top3_frac"), lit(0.0)).as("top3_frac"),
        coalesce(col("top4_frac"), lit(0.0)).as("top4_frac"),
        coalesce(col("dup5_chars"), lit(0L)).cast("long").as("dup5_chars"),
        round(coalesce(col("dup5_chars"), lit(0L)) /
          col("total_chars").cast("double"), 4).as("dup5_frac"))
  }
}
