package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization (gaps-and-islands): assign events to sessions per
  * key where a gap above `gapMinutes` starts a new session — the batch
  * counterpart of [[graft.streaming.EventStream.sessionCounts]].
  *
  * Two window passes over the same (key, ts) ordering — one shuffle on
  * the key, both windows pipeline in the same stage. Timestamps compare
  * as integral micros (exact). Ties on ts are safe: the default RANGE
  * frame gives every tied row the same running break-sum, so session
  * assignment and all downstream aggregates are deterministic even though
  * tie order is not. */
object Sessionize {

  /** Adds `session_idx` (1-based per key, ascending by time). Input
    * columns are preserved. */
  def assign(df: DataFrame, keyCol: String, tsCol: String,
             gapMinutes: Long): DataFrame = {
    val (us, brk) = ("__graft_sess_us", "__graft_sess_brk")
    require(!df.columns.contains(us) && !df.columns.contains(brk),
      s"input must not already contain the scratch columns $us/$brk")
    require(!df.columns.contains("session_idx"),
      "input already contains the output column session_idx; " +
        "rename it first — assign would silently overwrite it")
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy(col(keyCol)).orderBy(col(us))
    val prev: Column = lag(col(us), 1).over(w)
    df.withColumn(us, unix_micros(col(tsCol)))
      .withColumn(brk,
        when(prev.isNull || col(us) - prev > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col(brk)).over(w))
      .drop(us, brk)
  }
}
