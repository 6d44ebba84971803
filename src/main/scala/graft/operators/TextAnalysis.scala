package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, document fingerprinting, quality scoring, and n-gram
  * marker-based language ID.
  *
  * All operators are pure `Column` expressions built from
  * `org.apache.spark.sql.functions` — no UDFs — so they stay inside
  * whole-stage codegen and scale linearly across executors (no shuffle; a
  * 100 TB documents table maps straight through). Every formula is also
  * expressible in ANSI SQL term-for-term, which is what lets the DuckDB
  * oracle verify them bit-exactly.
  */
object TextAnalysis {

  /** Whitespace-normalized text: trimmed, runs of whitespace collapsed. */
  def normText(c: Column): Column = regexp_replace(trim(c), "\\s+", " ")

  /** Aggressively-normalized text for fuzzy matching: lowercased, every
    * run of non-alphanumeric characters collapsed to one space, trimmed.
    * This is the normalization the published decontamination recipes
    * (GPT-3 appendix C, PaLM) apply before n-gram overlap, so a cased or
    * re-punctuated copy of a benchmark string still matches. Kept to
    * ASCII [a-z0-9] so the SQL-mirror oracle is engine-exact. */
  def normTextAggressive(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  /** Token count of normalized text = spaces + 1 (0 for empty).
    * Arithmetic instead of split() so the SQL mirror is engine-agnostic. */
  def tokenCount(c: Column): Column = tokenCountNorm(normText(c))

  /** [[tokenCount]] over ALREADY-normalized text — callers that need the
    * normalized column for several outputs materialize [[normText]] once
    * (its regex is the expensive part) and fan out from it. */
  def tokenCountNorm(tn: Column): Column =
    when(length(tn) === 0, lit(0L))
      .otherwise((length(tn) - length(translate(tn, " ", "")) + 1).cast("long"))

  /** Document fingerprint: md5 of normalized text. Whitespace-insensitive
    * exact-dedup key (reference has no analogue; standard pipeline op). */
  def fingerprint(c: Column): Column = md5(normText(c))

  /** Marker words per language; counted space-padded on lowercased text.
    * (The per-row counting lives in [[graft.functions.LangIdExpr]], which
    * mirrors these markers and the tie-break order.) */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " is ", " of "),
    "es" -> Seq(" el ", " la ", " de ", " y "),
    "de" -> Seq(" der ", " und ", " die ", " das "),
    "fr" -> Seq(" le ", " et ", " les ", " des "))

  /** Deterministic n-gram-marker language ID. CJK chars short-circuit to
    * zh; otherwise the language with the highest marker count wins, ties
    * broken by the fixed priority en > es > de > fr; no markers -> "und".
    *
    * The marker counting + tie-break runs in the native one-pass
    * [[graft.functions.LangIdExpr]]: the equivalent pure-Column
    * formulation (16 x `length(replace(...))`, each duplicated across
    * `when` branches) exceeds janino's method limit, dropping the whole
    * stage out of codegen and re-evaluating the duplicated chains
    * interpreted per row. Semantics are unchanged — the SQL-mirror oracle
    * still verifies the results hash-exactly. */
  def langId(c: Column): Column = {
    val t = concat(lit(" "), normText(lower(c)), lit(" "))
    // coalesce: NULL text must yield "und" (the no-markers answer, and what
    // the SQL mirror's CASE ... ELSE 'und' returns for NULL), not NULL —
    // LangIdExpr is null-safe and would propagate the null
    when(c.rlike("[\\u4e00-\\u9fff]"), "zh")
      .otherwise(coalesce(graft.functions.LangIdExpr.langIdMarkers(t), lit("und")))
  }

  /** C0/DEL control characters except whitespace (`\t` `\n` `\r`) —
    * the bytes a crawled corpus carries from broken encodings and
    * terminal dumps. RE2-compatible class, so the oracle replays the
    * strip identically. */
  val ControlChars = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

  /** Strip control characters (codegen'd regexp_replace). */
  def stripControl(c: Column): Column = regexp_replace(c, ControlChars, "")

  /** Unicode NFC canonicalization via the native
    * [[graft.functions.UnicodeNormalize]] expression: base+combining
    * sequences compose to their precomposed forms, so visually-identical
    * text hashes identically in every downstream dedup/fingerprint
    * operator. Already-NFC strings take a zero-allocation fast path. */
  def nfc(c: Column): Column = graft.functions.UnicodeNormalize.nfc(c)

  /** HTML -> text for crawled pages, the extraction step before any
    * quality/dedup pass. RE2-compatible throughout (no backreferences —
    * script and style blocks get separate non-greedy patterns), so the
    * oracle replays the strip identically: script/style blocks die
    * first (their CONTENT is code, not prose), then comments, then
    * tags, then the five core entities decode, then whitespace
    * collapses. Codegen'd regexp chain, zero shuffle, linear scan. */
  def stripHtml(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val ent = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(noTags, "&lt;", "<"),
            "&gt;", ">"),
          "&quot;", "\""),
        "&#39;", "'"),
      "&amp;", "&") // ampersand LAST so &amp;lt; decodes to &lt;, not <
    normText(ent)
  }

  /** Punctuation character count (.,;:!?). */
  def punctCount(c: Column): Column =
    (length(c) - length(translate(c, ".,;:!?", ""))).cast("long")

  /** Gopher mean-word-length signal: chars excluding separators over
    * token count of the normalized text (one definition shared by the
    * standalone gate and the ensemble decision — the oracles compose,
    * so the Spark sides must too). */
  def meanWordLen(c: Column): Column = {
    val tn = normText(c)
    val n = size(split(tn, " "))
    round((length(tn) - (n - 1)).cast("double") / n, 4)
  }

  /** Gopher repetition signal: fraction of tokens repeating an earlier
    * token. */
  def repTokenFrac(c: Column): Column = {
    val toks = split(normText(c), " ")
    round(lit(1.0) - size(array_distinct(toks)).cast("double") / size(toks), 4)
  }

  /** PII patterns (emails, IPv4 addresses, US-style dashed phone
    * numbers) — RE2-compatible (no lookaround, no backrefs), so an
    * independent engine recomputes matches identically. The pattern set
    * is deliberately the high-precision core of the published scrubbing
    * recipes; extend per deployment. */
  val PiiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** Octets bounded to 0-255 and the run `\b`-anchored on both sides, so
    * `v1.2.3.4` and `999.1.1.1` no longer count; `1.2.3.4.5` still
    * yields one match on its leading 4-octet prefix — excluding that
    * would need lookaround, which RE2 lacks (deliberate trade for oracle
    * replayability). */
  private val Ipv4Octet = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
  val PiiIpv4 = s"\\b$Ipv4Octet(\\.$Ipv4Octet){3}\\b"
  val PiiPhone = "\\d{3}-\\d{3}-\\d{4}"

  /** Per-pattern match counts (codegen'd regexp_count — no UDF). */
  def piiEmailCount(c: Column): Column = regexp_count(c, lit(PiiEmail))
  def piiIpv4Count(c: Column): Column = regexp_count(c, lit(PiiIpv4))
  def piiPhoneCount(c: Column): Column = regexp_count(c, lit(PiiPhone))

  /** Redact all three PII classes with typed markers. Order matters and
    * is pinned (email before IPv4: an email's domain can contain
    * digit-dot runs; scrubbing emails first keeps the classes disjoint). */
  def scrubPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, PiiEmail, "[EMAIL]"),
        PiiIpv4, "[IP]"),
      PiiPhone, "[PHONE]")

  /** Heuristic quality score in [0,1]:
    * token-volume saturation x (1 - punct density) x (1 - upper density).
    * Deterministic double arithmetic, mirrored exactly in the oracle. */
  def qualityScore(c: Column): Column = {
    val len = length(c)
    val upperCount = len - length(translate(c, "ABCDEFGHIJKLMNOPQRSTUVWXYZ", ""))
    when(len === 0, lit(0.0)).otherwise(
      round(
        least(lit(1.0), tokenCount(c) / lit(50.0)) *
          (lit(1.0) - punctCount(c) / len) *
          (lit(1.0) - upperCount / len),
        4))
  }

  // ------------------------------------------------------------------
  // Readability (Flesch 1948)
  // ------------------------------------------------------------------

  /** Sentence count: runs of sentence-ending punctuation, floored at 1
    * for non-empty text (a fragment with no terminal punctuation is one
    * sentence). Counted arithmetically via the marker-diff trick so the
    * SQL mirror is engine-exact. */
  def sentenceCount(c: Column): Column = {
    val marked = length(regexp_replace(c, "[.!?]+", "#"))
    val removed = length(regexp_replace(c, "[.!?]+", ""))
    greatest(lit(1L), (marked - removed).cast("long"))
  }

  /** Heuristic syllable count: vowel groups ([aeiouy]+) on lowercased
    * text — the standard cheap approximation under automated
    * Flesch scoring (each maximal vowel run ≈ one syllable nucleus).
    * Counted arithmetically for the engine-exact SQL mirror. */
  def syllableCount(c: Column): Column = {
    val lc = lower(c)
    val marked = length(regexp_replace(lc, "[aeiouy]+", "#"))
    val removed = length(regexp_replace(lc, "[aeiouy]+", ""))
    (marked - removed).cast("long")
  }

  /** Flesch Reading Ease (Flesch 1948, the readability dimension of
    * edu-quality curation filters):
    *
    *   206.835 - 1.015 * (words/sentences) - 84.6 * (syllables/words)
    *
    * over [[tokenCount]] / [[sentenceCount]] / [[syllableCount]]. All
    * three operands are exact BIGINTs, and the formula is the identical
    * left-associated IEEE expression in both engines, so the double is
    * bit-identical cross-engine with NO decimal detour. NULL-safe: empty
    * text (0 words) yields NULL rather than a division error. */
  def fleschEase(c: Column): Column = {
    val w = tokenCount(c).cast("double")
    val s = sentenceCount(c).cast("double")
    val sy = syllableCount(c).cast("double")
    when(w === 0.0, lit(null).cast("double")).otherwise(
      lit(206.835) - lit(1.015) * (w / s) - lit(84.6) * (sy / w))
  }
}
