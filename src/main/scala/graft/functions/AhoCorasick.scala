package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-keyword scrubbing with an Aho-Corasick automaton — the
  * linear-time replacement for the regex-alternation blocklist scrub.
  *
  * A production blocklist (toxic phrases, boilerplate banners, license
  * headers, leaked-secret markers) holds 10^4-10^6 terms. A compiled
  * alternation `(t1|t2|...|tN)` degrades toward O(text x N) in the worst
  * case and many engines refuse to compile it at all; the Aho-Corasick
  * automaton matches ALL terms in one O(text + matches) pass regardless of
  * dictionary size (Aho & Corasick, CACM 1975). The automaton is built
  * once on the driver and shipped to executors as a codegen reference
  * object — at 100 TB this is scan-side map-only work, no shuffle, with a
  * dictionary cost paid once per executor, not per row.
  *
  * Match semantics mirror a leftmost, longest-alternative-first `g`-flag
  * regex replace (what RE2/DuckDB `regexp_replace` does when the
  * alternation lists longer terms first): scan left to right; at the
  * smallest position with any match take the LONGEST term starting there;
  * consume it (no overlapping rescans) and continue after its end. The
  * correctness oracle replays exactly that with a longest-first
  * alternation.
  *
  * Output is a struct `{scrubbed, n_matches}` so one pass yields both the
  * redacted text and the audit count.
  */
case class AcScrub(child: Expression, keywords: Array[String], replacement: String)
    extends UnaryExpression {

  require(keywords.nonEmpty, "empty keyword list")
  require(keywords.forall(_.nonEmpty), "empty keyword in list")

  override def dataType: DataType = StructType(Seq(
    StructField("scrubbed", StringType, nullable = false),
    StructField("n_matches", IntegerType, nullable = false)))
  override def prettyName: String = "ac_scrub"

  @transient private lazy val automaton: AcAutomaton = new AcAutomaton(keywords)

  override def nullSafeEval(input: Any): Any =
    AcScrub.run(input.asInstanceOf[UTF8String], automaton, replacement)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("acAutomaton", automaton, classOf[AcAutomaton].getName)
    val rRef = ctx.addReferenceObj("acReplacement", replacement, "java.lang.String")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.AcScrub.run($c, $aRef, $rRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): AcScrub =
    copy(child = newChild)

  override def equals(o: Any): Boolean = o match {
    case other: AcScrub =>
      child == other.child && replacement == other.replacement &&
        java.util.Arrays.equals(
          keywords.asInstanceOf[Array[AnyRef]], other.keywords.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() + replacement.hashCode) +
      java.util.Arrays.hashCode(keywords.asInstanceOf[Array[AnyRef]])
}

object AcScrub {

  /** `struct(scrubbed, n_matches)` — every keyword occurrence (leftmost,
    * longest-at-position, non-overlapping) replaced by `replacement`. */
  def scrub(text: Column, keywords: Seq[String], replacement: String): Column =
    GraftBridge.column(AcScrub(GraftBridge.expression(text), keywords.toArray, replacement))

  def run(text: UTF8String, automaton: AcAutomaton, replacement: String): InternalRow = {
    val s = text.toString
    val matches = automaton.findAll(s)
    if (matches.isEmpty)
      return new GenericInternalRow(Array[Any](text, 0))
    // Greedy leftmost-longest non-overlapping selection. findAll returns
    // (start, len) sorted by (start asc, len desc), so the first match at
    // or after the cursor is the longest one starting leftmost.
    val sb = new java.lang.StringBuilder(s.length)
    var cursor = 0
    var n = 0
    var i = 0
    while (i < matches.length) {
      val start = matches(i)._1
      val len = matches(i)._2
      if (start >= cursor) {
        sb.append(s, cursor, start).append(replacement)
        cursor = start + len
        n += 1
      }
      i += 1
    }
    sb.append(s, cursor, s.length)
    new GenericInternalRow(Array[Any](UTF8String.fromString(sb.toString), n))
  }
}

/** Array-indexed Aho-Corasick automaton (goto + fail + per-node match
  * lengths), built once driver-side and serialized to executors. */
final class AcAutomaton(keywords: Array[String]) extends Serializable {

  // Trie nodes: per-node char->node transition map + lengths of keywords
  // ending here (own + via suffix links, merged during the BFS).
  private val next = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
  private val lensBuf = mutable.ArrayBuffer(Array.emptyIntArray)
  private val failBuf = mutable.ArrayBuffer(0)

  locally {
    keywords.foreach { kw =>
      var node = 0
      var i = 0
      while (i < kw.length) {
        node = next(node).getOrElseUpdate(kw.charAt(i), {
          next += mutable.HashMap.empty[Char, Int]
          lensBuf += Array.emptyIntArray
          failBuf += 0
          next.length - 1
        })
        i += 1
      }
      if (!lensBuf(node).contains(kw.length))
        lensBuf(node) = (lensBuf(node) :+ kw.length).sortBy(-_)
    }
    // BFS fail links; merge suffix-reachable match lengths into each node
    // so the scan never follows output links.
    val queue = mutable.Queue.empty[Int]
    next(0).valuesIterator.foreach { c => failBuf(c) = 0; queue += c }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      next(u).foreach { case (ch, v) =>
        var f = failBuf(u)
        while (f != 0 && !next(f).contains(ch)) f = failBuf(f)
        failBuf(v) = next(f).get(ch).filter(_ != v).getOrElse(0)
        if (lensBuf(failBuf(v)).nonEmpty)
          lensBuf(v) = (lensBuf(v) ++ lensBuf(failBuf(v))).distinct.sortBy(-_)
        queue += v
      }
    }
  }

  private val gotoMaps: Array[java.util.HashMap[Character, Integer]] = next.map { m =>
    val jm = new java.util.HashMap[Character, Integer](math.max(4, m.size * 2))
    m.foreach { case (k, v) => jm.put(k, v) }
    jm
  }.toArray
  private val fail: Array[Int] = failBuf.toArray
  private val lens: Array[Array[Int]] = lensBuf.toArray

  /** All matches as (start, length), sorted (start asc, length desc). */
  def findAll(s: String): Array[(Int, Int)] = {
    val out = mutable.ArrayBuffer.empty[(Int, Int)]
    var node = 0
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      var n = node
      var step = gotoMaps(n).get(ch)
      while (step == null && n != 0) { n = fail(n); step = gotoMaps(n).get(ch) }
      node = if (step == null) 0 else step.intValue()
      val ls = lens(node)
      var j = 0
      while (j < ls.length) { out += ((i - ls(j) + 1, ls(j))); j += 1 }
      i += 1
    }
    out.sortInPlaceBy(m => (m._1, -m._2)).toArray
  }
}
