package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe equi-key + time-window range join.
  *
  * Finds pairs (a, b) with `a.key == b.key` and
  * `b.ts in (a.ts, a.ts + window]`. The naive plan — equi-join on the key
  * with the range predicate as a post-filter — is a sort-merge join whose
  * per-key work is quadratic in that key's row count: one hot key (a user
  * with 10^9 events) serializes an entire join into a single straggler
  * task.
  *
  * Here both sides bucket time into window-width buckets and join on the
  * COMPOSITE (key, bucket): any partner inside (a.ts, a.ts+window] lies in
  * a's bucket k or k+1 (the interval length equals the bucket width), so
  * the probe side expands into exactly those two bucket keys and the exact
  * range predicate evaluates inside each bucket-local group. Work per
  * shuffle key is now bounded by events-per-(key, window) — proportional
  * to the true output — and a hot key spreads over as many shuffle keys
  * as it spans buckets.
  *
  * Timestamps are compared in integral micros (exact; no interval/double
  * arithmetic). Assumes post-1970 timestamps (integral `div` bucketing).
  */
object RangeJoin {

  /** Pairs with equal `keyCol` and `b.ts` in `(a.ts, a.ts + windowSec]`.
    * Returns (keyCol, a_id, a_ts, b_id, b_ts). */
  def pairs(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
            windowSec: Long): DataFrame = {
    val widthMicros = windowSec * 1000000L
    val e = df.select(col(keyCol).as("k"), col(tsCol).as("ts"), col(idCol).as("id"))
      .withColumn("us", expr(s"unix_micros(ts)"))
      .withColumn("bk", expr(s"unix_micros(ts) div ${widthMicros}L"))
    val probe = e.select(col("k"), col("us").as("a_us"), col("ts").as("a_ts"),
      col("id").as("a_id"), explode(array(col("bk"), col("bk") + 1)).as("jbk"))
    val build = e.select(col("k").as("bk2"), col("us").as("b_us"), col("ts").as("b_ts"),
      col("id").as("b_id"), col("bk").as("jbk2"))
    probe.join(build,
        col("k") === col("bk2") && col("jbk") === col("jbk2") &&
          col("b_us") > col("a_us") && col("b_us") <= col("a_us") + widthMicros)
      .select(col("k").as(keyCol), col("a_id"), col("a_ts"), col("b_id"), col("b_ts"))
  }

  /** INTERVAL-OVERLAP join — both sides carry ranges (the general case
    * [[pairs]]' point-in-window is a special case of): per shared key,
    * every (a, b) pair whose half-open integral intervals intersect
    * (`a.start < b.end && b.start < a.end`).
    *
    * Same bucketization discipline: each interval registers in every
    * `bucketWidth`-wide bucket it covers (explosion factor = interval
    * length / bucketWidth — size the dial to typical interval length),
    * candidates come from a (key, bucket) equi-join, and the
    * CANONICAL-BUCKET rule (keep a pair only in the bucket containing
    * the overlap's start, `max(a.start, b.start)`) dedups multi-bucket
    * matches WITHOUT a distinct shuffle. Per-shuffle-key work is
    * bounded by intervals-per-(key, bucket); empty intervals
    * (`end <= start`) never match. Callers pre-alias column collisions
    * (only `keyCol` is shared). */
  def intervalOverlap(a: DataFrame, b: DataFrame, keyCol: String,
                      aStart: String, aEnd: String,
                      bStart: String, bEnd: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    def buckets(s: String, e: String): Column =
      sequence(floor(col(s) / bucketWidth).cast("long"),
        floor((col(e) - 1) / bucketWidth).cast("long"))
    val ab = a.filter(col(aEnd) > col(aStart))
      .withColumn("__bkt", explode(buckets(aStart, aEnd)))
    val bb = b.filter(col(bEnd) > col(bStart))
      .withColumn("__bkt", explode(buckets(bStart, bEnd)))
    ab.join(bb, Seq(keyCol, "__bkt"))
      .filter(col(aStart) < col(bEnd) && col(bStart) < col(aEnd))
      .filter(col("__bkt") ===
        floor(greatest(col(aStart), col(bStart)) / bucketWidth).cast("long"))
      .drop("__bkt")
  }
}
