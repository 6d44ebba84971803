package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Marker-based language ID over a pre-normalized, lowercased,
  * space-padded text column — one pass per row.
  *
  * Exists because the pure-`Column` formulation (16 markers x
  * `length(replace(...))` occurrence counts, each repeated across `when`
  * branches) expands past janino's 64KB method limit: Spark falls back to
  * interpreted evaluation and re-walks the duplicated `replace` chains per
  * branch per row. This expression counts all markers in a single scan and
  * applies the identical tie-break, so results match the SQL-mirror oracle
  * bit-for-bit while staying inside whole-stage codegen.
  *
  * Occurrence semantics replicate `replace(t, m, '')` length arithmetic:
  * non-overlapping matches, scanning left to right. */
case class LangIdExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id_markers"

  override def nullSafeEval(t: Any): Any =
    LangIdExpr.langOf(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangIdExpr.langOf($c)")

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

object LangIdExpr {

  /** `t` must already be `' ' || normText(lower(text)) || ' '`. */
  def langIdMarkers(t: Column): Column =
    GraftBridge.column(LangIdExpr(GraftBridge.expression(t)))

  /** Marker words per language, space-padded (single source of truth is
    * [[graft.operators.TextAnalysis.LangMarkers]]; mirrored here as plain
    * arrays for the per-row hot loop). Order = tie-break priority. */
  private val langs = Array("en", "es", "de", "fr")
  private val markers: Array[Array[String]] = Array(
    Array(" the ", " and ", " is ", " of "),
    Array(" el ", " la ", " de ", " y "),
    Array(" der ", " und ", " die ", " das "),
    Array(" le ", " et ", " les ", " des "))
  private val out: Array[UTF8String] =
    (langs :+ "und").map(UTF8String.fromString)

  def langOf(t: UTF8String): UTF8String = {
    val s = t.toString
    val scores = new Array[Int](4)
    var li = 0
    while (li < 4) {
      val ms = markers(li)
      var mi = 0
      var total = 0
      while (mi < ms.length) {
        val m = ms(mi)
        var i = s.indexOf(m)
        while (i >= 0) { total += 1; i = s.indexOf(m, i + m.length) }
        mi += 1
      }
      scores(li) = total
      li += 1
    }
    // identical when-chain tie-break as the Column/SQL formulation:
    // en if en>=es,de,fr and >0; else es if es>=de,fr and >0; ...
    val (en, es, de, fr) = (scores(0), scores(1), scores(2), scores(3))
    if (en >= es && en >= de && en >= fr && en > 0) out(0)
    else if (es >= de && es >= fr && es > 0) out(1)
    else if (de >= fr && de > 0) out(2)
    else if (fr > 0) out(3)
    else out(4)
  }
}
