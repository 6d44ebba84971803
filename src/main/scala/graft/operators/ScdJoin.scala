package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-time (SCD Type 2) dimension join — the warehouse op that
  * attaches to each fact row the dimension VERSION that was valid at the
  * fact's event time (Kimball's slowly-changing-dimension Type 2:
  * versions carry `[valid_from, valid_to)` half-open windows that
  * partition each key's timeline).
  *
  * Plan shape: an equi-join on the dimension key with the validity
  * window as a join-condition filter — per-key fan-out is bounded by
  * that key's VERSION COUNT (small by construction: versions are
  * slowly changing), so the join never degenerates toward all-pairs the
  * way a general interval join can. A dimension that fits in memory
  * broadcasts (pass `broadcastDim = true`, the common case — dimensions
  * are small relative to 100 TB facts and the fact side then never
  * shuffles); otherwise both sides hash-partition on the key. */
object ScdJoin {

  /** Join `fact` to the dimension version valid at `fact.tsCol`:
    * `dim.fromCol <= ts < dim.toCol` (half-open — a version boundary
    * instant belongs to the NEW version). `how` = "inner" drops facts
    * with no valid version (gaps in dimension history); "left" keeps
    * them null-extended. */
  def pointInTime(fact: DataFrame, dim: DataFrame, keyCol: String,
                  tsCol: String, fromCol: String = "valid_from",
                  toCol: String = "valid_to", how: String = "inner",
                  broadcastDim: Boolean = true): DataFrame = {
    require(Seq("inner", "left").contains(how), s"how must be inner|left, got $how")
    val d = if (broadcastDim) broadcast(dim) else dim
    val cond = fact(keyCol) === d(keyCol) &&
      fact(tsCol) >= d(fromCol) && fact(tsCol) < d(toCol)
    fact.join(d, cond, if (how == "left") "left_outer" else "inner")
      .drop(d(keyCol))
  }
}
