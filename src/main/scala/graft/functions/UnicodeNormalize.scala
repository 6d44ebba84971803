package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native codegen'd
  * expression — the canonicalization step a multilingual corpus needs
  * before fingerprinting/dedup: the same visible text can arrive as
  * precomposed codepoints or base+combining sequences (e.g. `é` vs
  * `e`+U+0301), and every hash-based operator downstream would treat
  * them as different documents.
  *
  * Spark has no built-in normalizer; a Scala UDF would leave codegen and
  * serialize per row. This expression stays in the generated plan and
  * takes the `Normalizer.isNormalized` fast path — for already-NFC text
  * (the overwhelming majority of any real corpus) the input buffer is
  * returned untouched, no allocation, so the 100 TB cost is one scan per
  * string. NFC matches DuckDB's `nfc_normalize` codepoint-for-codepoint
  * (both implement UAX #15), which is what lets the oracle replay it.
  */
case class UnicodeNormalize(child: Expression, form: Normalizer.Form)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = s"unicode_normalize_${form.name.toLowerCase}"

  override def nullSafeEval(s: Any): Any =
    UnicodeNormalize.normalize(s.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // form resolved at codegen time — the generated call carries no
    // per-row enum lookup
    val m = form.name.toLowerCase
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNormalize.$m($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {

  def nfc(c: Column): Column = of(c, Normalizer.Form.NFC)
  def nfd(c: Column): Column = of(c, Normalizer.Form.NFD)
  def nfkc(c: Column): Column = of(c, Normalizer.Form.NFKC)
  def nfkd(c: Column): Column = of(c, Normalizer.Form.NFKD)

  def of(c: Column, form: Normalizer.Form): Column =
    GraftBridge.column(UnicodeNormalize(GraftBridge.expression(c), form))

  def normalize(u: UTF8String, form: Normalizer.Form): UTF8String = {
    val s = u.toString
    // fast path: already normalized (true for nearly all real text) —
    // return the input buffer, zero allocation beyond the String view
    if (Normalizer.isNormalized(s, form)) u
    else UTF8String.fromString(Normalizer.normalize(s, form))
  }

  // per-form entry points referenced from generated code
  def nfc(u: UTF8String): UTF8String = normalize(u, Normalizer.Form.NFC)
  def nfd(u: UTF8String): UTF8String = normalize(u, Normalizer.Form.NFD)
  def nfkc(u: UTF8String): UTF8String = normalize(u, Normalizer.Form.NFKC)
  def nfkd(u: UTF8String): UTF8String = normalize(u, Normalizer.Form.NFKD)
}
