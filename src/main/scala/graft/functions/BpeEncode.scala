package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level byte-pair-encoding tokenizer over a pinned merges table —
  * the real LLM-pipeline tokenization step (GPT-2's public algorithm:
  * pre-tokenize, explode each pre-token into bytes, then greedily apply a
  * learned merge list), replacing the regexp "BPE-ish" stand-in so token
  * counts match what a training run actually sees for this vocabulary.
  *
  * Symbols are UTF-8 BYTES, each mapped to the Latin-1 char of its value
  * (bytes 0x80-0xFF appear as U+0080-U+00FF) so tokens remain plain
  * strings; on ASCII text — the entire gate corpus — byte symbols and
  * character symbols coincide, which is what lets the correctness oracle
  * recompute the merge cascade character-wise in SQL.
  *
  * Merges apply in RANK ORDER, one leftmost-non-overlapping global pass
  * per merge (Sennrich's original formulation). For a well-formed table —
  * each operand is a single byte or the output of an earlier merge, which
  * [[BpeEncoder]] validates at construction — this is provably equivalent
  * to GPT-2's min-rank-present loop: a merge at rank r only ever creates
  * adjacencies involving its own output token, whose merges all sit at
  * ranks > r, so no lower-rank pair can (re)appear after its pass. The
  * equivalence is also spec-checked against an independent min-rank
  * implementation (BpeSpec). Rank-order passes are what the DuckDB oracle
  * replays as a chain of string `replace` calls.
  *
  * Per-row work is O(merges x bytes) with zero allocation beyond the
  * symbol arrays — embarrassingly parallel, no shuffle; at 100 TB this is
  * the plain scan-side tokenization cost.
  */
final case class BpeEncoder(merges: List[(String, String)]) {
  require(merges.nonEmpty, "empty merges table")
  locally {
    val built = scala.collection.mutable.HashSet.empty[String]
    merges.foreach { case (x, y) =>
      require(x.nonEmpty && y.nonEmpty, s"empty merge operand in ($x,$y)")
      require(x.length == 1 || built(x),
        s"merge operand '$x' is neither a single byte nor an earlier merge output")
      require(y.length == 1 || built(y),
        s"merge operand '$y' is neither a single byte nor an earlier merge output")
      built += x + y
    }
  }

  @transient private lazy val pretok =
    java.util.regex.Pattern.compile(BpeEncoder.PreTokenPattern)
  @transient private lazy val mergeArr: Array[(String, String)] = merges.toArray

  /** Tokenize a full document: pre-token split, per-pre-token merges,
    * flattened token array (never crosses pre-token boundaries). */
  def encode(t: UTF8String): ArrayData = {
    val out = ArrayBuffer.empty[Any]
    val m = pretok.matcher(t.toString)
    while (m.find()) {
      val toks = encodeWord(m.group())
      var i = 0
      while (i < toks.length) { out += UTF8String.fromString(toks(i)); i += 1 }
    }
    new GenericArrayData(out.toArray)
  }

  /** Apply the merge cascade to one pre-token. Exposed for specs. */
  def encodeWord(w: String): Array[String] = {
    val bytes = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var syms = new Array[String](bytes.length)
    var i = 0
    while (i < bytes.length) { syms(i) = BpeEncoder.byteSym(bytes(i)); i += 1 }
    var n = syms.length
    var r = 0
    while (r < mergeArr.length && n >= 2) {
      val x = mergeArr(r)._1
      val y = mergeArr(r)._2
      // leftmost-non-overlapping single pass, compacting in place
      var src = 0
      var dst = 0
      while (src < n) {
        if (src + 1 < n && syms(src) == x && syms(src + 1) == y) {
          syms(dst) = x + y
          src += 2
        } else {
          syms(dst) = syms(src)
          src += 1
        }
        dst += 1
      }
      n = dst
      r += 1
    }
    java.util.Arrays.copyOfRange(syms, 0, n)
  }
}

object BpeEncoder {
  /** Pre-token split shared verbatim with the learner and the SQL oracle:
    * alnum runs and non-alnum-non-space runs; whitespace is discarded (a
    * pinned simplification of GPT-2's leading-space convention — its
    * lookahead `\s+(?!\S)` does not exist in RE2, the oracle's regex
    * engine, so the cross-engine-safe split is whitespace-free). */
  final val PreTokenPattern = "[A-Za-z0-9]+|[^A-Za-z0-9\\s]+"

  private val symCache: Array[String] =
    Array.tabulate(256)(b => String.valueOf(b.toChar))
  private[functions] def byteSym(b: Byte): String = symCache(b & 0xff)
}

/** Catalyst expression wrapping [[BpeEncoder.encode]]: string -> array of
  * merged BPE tokens. Codegen emits a direct call on the broadcast encoder
  * reference, so the expression stays inside whole-stage codegen. */
case class BpeEncode(child: Expression, encoder: BpeEncoder)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override def nullSafeEval(t: Any): Any =
    encoder.encode(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncoder", encoder, classOf[BpeEncoder].getName)
    defineCodeGen(ctx, ev, c => s"(${classOf[ArrayData].getName}) $ref.encode($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {
  def bpeTokens(c: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.column(BpeEncode(GraftBridge.expression(c), BpeEncoder(merges.toList)))
}
