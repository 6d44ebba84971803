package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style page cleaning (Raffel et al. 2020, "Exploring the Limits of
  * Transfer Learning with a Unified Text-to-Text Transformer", §2.2) —
  * the published line/page rule set the original C4 corpus was built
  * with, and still the canonical first-pass web-text cleaner:
  *
  *   - keep only lines ending in a terminal punctuation mark
  *     (`.` `!` `?` `"`);
  *   - keep only lines with at least `minLineWords` words (C4: 5);
  *   - drop lines containing any of `lineDropTerms` (C4: "javascript");
  *   - drop PAGES with fewer than `minKeptLines` retained lines (C4: 3
  *     sentences);
  *   - drop pages containing any of `pageDropPhrases` (C4: "lorem
  *     ipsum") or a curly bracket.
  *
  * (The remaining C4 steps — bad-word page filtering and three-sentence
  * span dedup — are the same mechanics: extend `pageDropPhrases` for the
  * former; [[Dedup.spanPairs]]/[[Dedup.removeDuplicateSpans]] are the
  * latter at token granularity.)
  *
  * Scale shape: ONE `posexplode` over lines and ONE doc-keyed shuffle
  * (the reassembly groupBy) — identical to the repetition suite's
  * contract. Per-line predicates are plain codegen'd Column expressions
  * (no UDFs, no interpreted higher-order functions); per-group state is
  * bounded by page size. Mirrored term-for-term in ANSI SQL for the
  * DuckDB oracle.
  */
object C4Filter {

  /** Terminal punctuation set (C4 §2.2: "terminal punctuation mark
    * (i.e. a period, exclamation mark, question mark, or end quotation
    * mark)"). */
  val TerminalPunct: Seq[String] = Seq(".", "!", "?", "\"")

  /** Clean `df` with the C4 rule set. Lines are whitespace-normalized
    * ([[TextAnalysis.normText]]) before testing and reassembly, so the
    * output is also canonical for downstream fingerprinting.
    *
    * Output: (`idCol`, n_lines, n_kept, keep_doc, clean_text) — one row
    * per input doc; `clean_text` is the retained lines re-joined with
    * `\n` in original order (empty when nothing survives), `keep_doc`
    * the page-level verdict.
    */
  def clean(df: DataFrame, idCol: String, textCol: String,
            minLineWords: Int = 5, minKeptLines: Int = 3,
            lineDropTerms: Seq[String] = Seq("javascript"),
            pageDropPhrases: Seq[String] = Seq("lorem ipsum"),
            dropBracePages: Boolean = true): DataFrame = {
    require(minLineWords >= 1, s"minLineWords >= 1, got $minLineWords")
    require(minKeptLines >= 0, s"minKeptLines >= 0, got $minKeptLines")
    val id = col(idCol)

    def anyContains(c: Column, terms: Seq[String]): Column =
      terms.map(t => lower(c).contains(lit(t.toLowerCase)))
        .reduceOption(_ || _).getOrElse(lit(false))

    // one posexplode; all per-line predicates stay in this projection so
    // the normText regex materializes once per line
    val lines = df
      .select(id, posexplode(split(coalesce(col(textCol), lit("")), "\n"))
        .as(Seq("pos", "raw")))
      .select(id, col("pos"), TextAnalysis.normText(col("raw")).as("nline"))
      .withColumn("keep_line",
        substring(col("nline"), -1, 1).isin(TerminalPunct: _*) &&
          TextAnalysis.tokenCountNorm(col("nline")) >= minLineWords &&
          !anyContains(col("nline"), lineDropTerms))
      .withColumn("page_phrase", anyContains(col("nline"), pageDropPhrases))
      .withColumn("page_brace",
        if (dropBracePages)
          col("nline").contains("{") || col("nline").contains("}")
        else lit(false))

    // the one doc-keyed shuffle: counts + page flags + ordered reassembly
    // (collect_list skips the nulls the `when` leaves for dropped lines;
    // array_sort restores original line order by pos)
    lines.groupBy(id)
      .agg(
        count(lit(1)).as("n_lines"),
        coalesce(sum(col("keep_line").cast("long")), lit(0L)).as("n_kept"),
        bool_or(col("page_phrase")).as("has_phrase"),
        bool_or(col("page_brace")).as("has_brace"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("keep_line"), struct(col("pos"), col("nline"))))),
            x => x.getField("nline")),
          "\n").as("clean_text"))
      .select(id, col("n_lines"), col("n_kept"),
        (col("n_kept") >= minKeptLines &&
          !col("has_phrase") && !col("has_brace")).as("keep_doc"),
        col("clean_text"))
  }
}
