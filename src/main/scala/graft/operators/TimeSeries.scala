package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered time-series operators whose recurrences are inherently
  * sequential PER KEY (cluster-parallel across keys).
  *
  * The EWMA recurrence s_i = a*x_i + (1-a)*s_(i-1) has no safe window
  * formulation: the closed form needs (1-a)^(-i) rescaling, which
  * overflows a double after a few thousand rows. So this is the honest
  * use of the custom-operator ladder's last rung — `mapGroups` over the
  * key-shuffled, in-group-sorted iterator: one exchange on the key,
  * group-bounded memory, a deterministic fold order pinned by the
  * (time, tiebreak) sort.
  */
object TimeSeries {

  /** Per-key EWMA over time-ordered values: s_1 = x_1,
    * s_i = alpha*x_i + (1-alpha)*s_(i-1). Emits one row per key with the
    * series length and the FINAL raw smoothed value (the
    * monitoring-snapshot shape; the fold is exact double arithmetic in
    * a deterministic order, so the result is identical on any
    * partitioning and replayable by any engine folding the same sorted
    * list — callers round for cross-engine hashing). `timeCol` must cast to long (e.g. unix micros);
    * `tieCol` breaks equal-time ordering deterministically.
    * Output: (<keyCol>, n, ewma_last). */
  def ewmaByKey(df: DataFrame, keyCol: String, timeCol: String,
                tieCol: String, valCol: String, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha in (0, 1], got $alpha")
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.types._
    // A string key cast("long") silently nulls out and collapses every
    // row into one bogus group; a Timestamp cast("long") coarsens to
    // epoch SECONDS, breaking the documented micros ordering. Validate
    // up front and fail loudly instead.
    def integral(n: String): Unit = {
      val t = df.schema(n).dataType
      require(t.isInstanceOf[ByteType] || t.isInstanceOf[ShortType] ||
          t.isInstanceOf[IntegerType] || t.isInstanceOf[LongType],
        s"ewmaByKey: column '$n' must be integral (byte/short/int/long), " +
          s"got ${t.simpleString} — cast it explicitly (strings would " +
          "silently become null and collapse groups)")
    }
    integral(keyCol); integral(tieCol)
    val timeExpr = df.schema(timeCol).dataType match {
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType =>
        col(timeCol).cast("long")
      case _: TimestampType => unix_micros(col(timeCol))
      case t => throw new IllegalArgumentException(
        s"ewmaByKey: column '$timeCol' must be integral or timestamp, " +
          s"got ${t.simpleString}")
    }
    df.schema(valCol).dataType match {
      case _: NumericType => ()
      case t => throw new IllegalArgumentException(
        s"ewmaByKey: column '$valCol' must be numeric, got ${t.simpleString}")
    }
    val ds = df.select(col(keyCol).cast("long"), timeExpr,
        col(tieCol).cast("long"), col(valCol).cast("double"))
      .as[(Long, Long, Long, Double)]
    ds.groupByKey(_._1).mapGroups { (k, it) =>
      val rows = it.toArray.sortBy(r => (r._2, r._3))
      var s = 0.0
      var first = true
      rows.foreach { r =>
        s = if (first) { first = false; r._4 }
          else alpha * r._4 + (1 - alpha) * s
      }
      (k, rows.length.toLong, s)
    }.toDF(keyCol, "n", "ewma_last")
  }
}
