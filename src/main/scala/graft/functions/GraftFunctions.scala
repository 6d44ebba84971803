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

  /** `regexp_replace(trim(e), "\s+", " ")` — the TextAnalysis.normText
    * normalization as a raw Catalyst tree, for SQL builders. */
  private def normalizeWs(e: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{RegExpReplace, StringTrim}
    RegExpReplace(StringTrim(e), Literal("\\s+"), Literal(" "))
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> (exprs => VecDot(exprs(0), exprs(1))),
    "sig_agree" -> (exprs => SigAgree(exprs(0), exprs(1))),
    "minhash_sig" -> (exprs =>
      MinHashSig(exprs(0), intArg(exprs(1), "k"), intArg(exprs(2), "shingleSize"))),
    "ngram_jaccard" -> (exprs =>
      NgramJaccard(exprs(0), exprs(1), intArg(exprs(2), "n"))),
    "lang_id_markers" -> (exprs => LangIdExpr(exprs.head)),
    // SQL simhash64 takes RAW text, like Dedup.simhash64: whitespace
    // normalization happens inside the builder so both surfaces produce
    // identical signatures for the same document
    "simhash64" -> (exprs => SimHash64Expr(normalizeWs(exprs.head))),
    "hll_sketch_distinct" -> (exprs => HllSketchAgg(exprs.head).toAggregateExpression()))

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
