package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/** Native one-pass scalar int8 quantization of an `array<double>` vector:
  * struct(codes array<int>, q_min double, q_scale double) with
  * code(i) = round((v(i) - min) / scale), scale = (max - min) / 255 —
  * the same affine math as the pure-Column formulation it replaces,
  * including Spark `round`'s HALF_UP semantics (BigDecimal on the exact
  * double value, so the DuckDB-recomputed oracle still hash-matches).
  *
  * Why native: the Column version inlines `array_min`/`array_max` INSIDE
  * the `transform` lambda, so every element evaluation rescans the whole
  * vector — O(d²) per row — and `transform` is CodegenFallback, dropping
  * the enclosing stage out of whole-stage codegen and re-evaluating the
  * lambda once per consuming reference. One compiled pass per row keeps
  * quantization at its true O(d) cost and the stage codegen'd.
  *
  * Degenerate inputs mirror the Column math: constant vectors (max ==
  * min) get scale 0 and all-zero codes; an empty vector yields empty
  * codes with null min/scale (`array_min` of an empty array is null). */
case class Int8Quantize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = Int8Quantize.outType
  override def prettyName: String = "int8_quantize"

  override def nullSafeEval(input: Any): Any =
    Int8Quantize.evalArr(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Int8Quantize.evalArr($c)")

  override protected def withNewChildInternal(newChild: Expression): Int8Quantize =
    copy(child = newChild)
}

object Int8Quantize {

  val outType: StructType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("q_min", DoubleType, nullable = true),
    StructField("q_scale", DoubleType, nullable = true)))

  /** Column API over an `array<double>` input. */
  def int8Quantize(c: Column): Column =
    GraftBridge.column(Int8Quantize(GraftBridge.expression(c)))

  /** Static entry point used by both interpreted eval and generated code.
    * Named evalArr (not eval): the case class inherits Expression.eval, so
    * an object method named eval gets NO static forwarder on the companion
    * class and janino-generated code fails to resolve it, silently dropping
    * the stage to interpreted fallback. */
  def evalArr(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    if (n == 0)
      return new GenericInternalRow(
        Array[Any](new GenericArrayData(Array.emptyIntArray), null, null))
    // min/max under Catalyst's double ordering (java.lang.Double.compare:
    // -0.0 < 0.0, NaN greatest) — bit-identical to array_min/array_max,
    // which the legacy Column formulation used
    var mn = arr.getDouble(0)
    var mx = mn
    var i = 1
    while (i < n) {
      val x = arr.getDouble(i)
      if (java.lang.Double.compare(x, mn) < 0) mn = x
      if (java.lang.Double.compare(x, mx) > 0) mx = x
      i += 1
    }
    val sc = (mx - mn) / 255.0
    val codes = new Array[Int](n)
    if (sc != 0.0) { // NaN != 0.0 is true: NaN-poisoned vectors take this
      i = 0         // branch and produce code 0 per element, like legacy
      while (i < n) {
        val y = (arr.getDouble(i) - mn) / sc
        // non-finite y (NaN-poisoned or overflowing spread): TOTAL
        // saturating semantics — code 0 for NaN, Int.Min/Max for +/-Inf.
        // The Column formulation ERRORS here under ANSI (CAST_OVERFLOW);
        // a corrupt embedding must not kill a 100 TB quantization job,
        // so this intentional divergence is spec'd as such. Finite y:
        // BigDecimal HALF_UP on the exact double value is bit-compatible
        // with round(_, 0) ((x-mn)/sc >= 0 here)
        codes(i) =
          if (java.lang.Double.isNaN(y)) 0
          else if (java.lang.Double.isInfinite(y))
            (if (y > 0) Int.MaxValue else Int.MinValue)
          else new java.math.BigDecimal(y)
            .setScale(0, java.math.RoundingMode.HALF_UP).intValue()
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](new GenericArrayData(codes), mn, sc))
  }
}
