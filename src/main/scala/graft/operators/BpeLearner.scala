package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BpeEncoder

/** BPE merges-table training: the distributed half is the corpus-sized
  * word-frequency aggregation (one explode + groupBy — the only pass that
  * touches all the bytes); merge learning then runs on the aggregated
  * word-count table, which is vocabulary-sized, not corpus-sized. That is
  * the standard tokenizer-training shape (HF tokenizers / the original
  * subword-nmt both train from a word->count dict): at 100 TB the corpus
  * scan is the distributed aggregation, and the dict that reaches the
  * driver is bounded by `maxWords` (top-N by frequency, deterministic
  * word tie-break), an explicit dial like the union-find cutover in
  * [[Dedup]].
  *
  * Learning is the textbook loop (Sennrich et al. 2016): count adjacent
  * symbol pairs weighted by word frequency, merge the most frequent pair
  * everywhere (leftmost-non-overlapping — identical to the apply pass in
  * [[graft.functions.BpeEncoder]]), repeat. Ties break on (count desc,
  * pair asc) so the learned table is deterministic on any engine.
  */
object BpeLearner {

  /** Learn `numMerges` merges from the corpus. */
  def learnMerges(df: DataFrame, textCol: String, numMerges: Int,
                  maxWords: Int = 100000): Seq[(String, String)] = {
    val counts = df
      .select(explode(regexp_extract_all(col(textCol),
        lit(BpeEncoder.PreTokenPattern), lit(0))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxWords) // bounds the driver collect; top-N by frequency
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    learnFromCounts(counts, numMerges)
  }

  /** Driver-side merge learning from an aggregated word-count table. */
  def learnFromCounts(wordCounts: Seq[(String, Long)],
                      numMerges: Int): Seq[(String, String)] = {
    // words as byte-symbol arrays (same Latin-1 byte mapping the encoder
    // uses), carried with their corpus frequency
    var words: Array[(Array[String], Long)] = wordCounts.iterator.map {
      case (w, c) =>
        val bytes = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        (Array.tabulate(bytes.length)(i => String.valueOf((bytes(i) & 0xff).toChar)), c)
    }.toArray

    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    while (round < numMerges) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (pairCounts.isEmpty) return merges.toSeq
      val best = pairCounts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }._1
      merges += best
      words = words.map { case (syms, c) =>
        if (syms.length < 2) (syms, c) else (applyMerge(syms, best._1, best._2), c)
      }
      round += 1
    }
    merges.toSeq
  }

  /** Leftmost-non-overlapping merge pass — same semantics as the encoder
    * and the oracle's string `replace`. */
  private def applyMerge(syms: Array[String], x: String, y: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == x && syms(i + 1) == y) {
        out += x + y; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }
}
