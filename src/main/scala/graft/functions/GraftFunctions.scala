package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL-surface registration for graft's native expressions, so `spark.sql`
  * users get them alongside the Column API:
  *
  *  - [[GraftFunctions.register]] installs them into an existing session's
  *    function registry (local/notebook use);
  *  - [[GraftExtensions]] is the `spark.sql.extensions`-compatible hook for
  *    cluster deployments (`--conf spark.sql.extensions=graft.functions.
  *    GraftExtensions`).
  */
object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  private def stringArg(e: Expression, what: String): String = e match {
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private def stringArrayArg(e: Expression, what: String): Array[String] = e match {
    case arr: org.apache.spark.sql.catalyst.expressions.CreateArray =>
      arr.children.map(c => stringArg(c, what)).toArray
    case Literal(a: org.apache.spark.sql.catalyst.util.ArrayData, _) =>
      a.toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString)
    case other => throw new IllegalArgumentException(
      s"$what must be an array of string literals, got $other")
  }

  // NOTE: these builders cannot reuse the Column-API functions directly —
  // Spark 4 Column nodes carry UnresolvedFunctions that never resolve
  // inside a FunctionRegistry builder (Unevaluable at codegen) — so the
  // normalization is restated as raw Catalyst trees. The SQL==Scala parity
  // spec in GraftFunctionsSpec pins the two surfaces together.

  /** `regexp_replace(trim(e), "\s+", " ")` — TextAnalysis.normText. */
  private def normalizeWs(e: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{RegExpReplace, StringTrim}
    RegExpReplace(StringTrim(e), Literal("\\s+"), Literal(" "))
  }

  /** Full TextAnalysis.langId semantics over raw text: CJK short-circuit,
    * padded normalized lowercase marker counting, NULL -> 'und'. */
  private def langIdTree(e: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{CaseWhen, Coalesce, Concat, Lower, RLike}
    val padded = Concat(Seq(Literal(" "), normalizeWs(Lower(e)), Literal(" ")))
    CaseWhen(
      Seq((RLike(e, Literal("[\\u4e00-\\u9fff]")), Literal("zh"))),
      Coalesce(Seq(LangIdExpr(padded), Literal("und"))))
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> (exprs => VecDot(exprs(0), exprs(1))),
    "jaro_winkler" -> (exprs => JaroWinkler(exprs(0), exprs(1))),
    "sig_agree" -> (exprs => SigAgree(exprs(0), exprs(1))),
    "minhash_sig" -> (exprs =>
      MinHashSig(exprs(0), intArg(exprs(1), "k"), intArg(exprs(2), "shingleSize"))),
    "ngram_jaccard" -> (exprs =>
      NgramJaccard(exprs(0), exprs(1), intArg(exprs(2), "n"))),
    // SQL lang_id / simhash64 take RAW text like their Scala APIs
    // (TextAnalysis.langId, Dedup.simhash64): normalization, padding and
    // null handling come from the same Column functions, so both surfaces
    // return identical results for identical documents
    "lang_id" -> (exprs => langIdTree(exprs.head)),
    // optional 2nd arg: portable=true swaps the token hash to MD5-low-64
    // (engine-portable signatures — see SimHash64Expr)
    "simhash64" -> (exprs => SimHash64Expr(normalizeWs(exprs.head),
      portable = exprs.lift(1).exists {
        case Literal(b: Boolean, _) => b
        case other => throw new IllegalArgumentException(
          s"simhash64 portable flag must be a boolean literal, got $other")
      })),
    // named to match DuckDB's nfc_normalize — the oracle replays it 1:1
    "nfc_normalize" -> (exprs =>
      UnicodeNormalize(exprs.head, java.text.Normalizer.Form.NFC)),
    "hll_sketch_distinct" -> (exprs => HllSketchAgg(exprs.head).toAggregateExpression()),
    "theta_sketch" -> (exprs => ThetaSketchAgg(exprs.head).toAggregateExpression()),
    // ac_scrub(text, array('kw', ...), 'replacement') -> struct(scrubbed,
    // n_matches); the dictionary must be literal (the automaton compiles
    // once at plan time, exactly like the Column API)
    "ac_scrub" -> (exprs => AcScrub(exprs(0),
      stringArrayArg(exprs(1), "ac_scrub keywords"),
      stringArg(exprs(2), "ac_scrub replacement"))))

  /** Install into an existing session (temp functions). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}

/** `spark.sql.extensions` entry point registering the same functions at
  * session build time. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
}
