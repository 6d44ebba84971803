package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right value whose time is <=
  * the left row's time, per key.
  *
  * Built by composition (preference (a) of the custom-operator ladder —
  * no new plan node needed): union both sides tagged, one window pass with
  * `last(value, ignoreNulls)` over rows-unbounded-preceding, keep left
  * rows. Cost = one shuffle on the key + one sort per partition — the
  * same lower bound a dedicated as-of merge join would have, and AQE
  * handles skewed keys. Right rows sort BEFORE left rows at equal
  * timestamps, matching the `left.t >= right.t` (inclusive) convention of
  * DuckDB/pandas ASOF joins.
  */
object AsOfJoin {

  /** Left-as-of-join a single right value column onto `left`: BACKWARD
    * direction (latest right at-or-before the left time).
    * Output = left columns + `outCol` (null when no prior right row). */
  def lastValueAsOf(left: DataFrame, right: DataFrame,
                    key: String, leftTime: String,
                    rightTime: String, rightValue: String,
                    outCol: String): DataFrame =
    asOf(left, right, key, leftTime, rightTime, rightValue, outCol,
      forward = false)

  /** FORWARD as-of: for each left row, the EARLIEST right value whose
    * time is >= the left row's time, per key — "next event after"
    * semantics (next purchase after a click, next maintenance after a
    * failure). Same one-shuffle union+window composition as the backward
    * join, mirrored: right rows sort AFTER left rows at equal
    * timestamps (inclusive), the frame looks forward, and `first`
    * replaces `last`. */
  def firstValueAsOf(left: DataFrame, right: DataFrame,
                     key: String, leftTime: String,
                     rightTime: String, rightValue: String,
                     outCol: String): DataFrame =
    asOf(left, right, key, leftTime, rightTime, rightValue, outCol,
      forward = true)

  /** NEAREST as-of: for each left row, the right value closest in time
    * in EITHER direction, ties (equal distance) going backward —
    * completing the family (backward / forward / nearest, the pandas
    * `merge_asof(direction=...)` trio). One union + ONE window pass
    * computing both direction candidates over the same sorted
    * partition, then a distance pick — same one-shuffle cost as the
    * single-direction joins, not two of them.
    *
    * Time columns must be NUMERIC (convert timestamps to `unix_micros`
    * first — the q42/EWMA convention): the distance comparison needs
    * subtraction, and a silent timestamp cast would coarsen to seconds.
    * Duplicate (key, time) right rows make the within-tie choice
    * partition-order-dependent; callers needing that edge deterministic
    * should pre-dedup or disambiguate the time column. */
  def nearestValueAsOf(left: DataFrame, right: DataFrame,
                       key: String, leftTime: String,
                       rightTime: String, rightValue: String,
                       outCol: String): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    // INTEGRAL times only: a double would silently truncate in the
    // cast("long") below and corrupt distances; a timestamp would
    // coarsen to seconds. Convert with unix_micros first.
    for ((df, c) <- Seq((left, leftTime), (right, rightTime))) {
      val t = df.schema(c).dataType
      require(t.isInstanceOf[ByteType] || t.isInstanceOf[ShortType] ||
          t.isInstanceOf[IntegerType] || t.isInstanceOf[LongType],
        s"nearestValueAsOf needs integral time columns, got " +
          s"${t.simpleString} for '$c' — convert timestamps with " +
          "unix_micros first")
    }
    val leftStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val valueType = right.schema(rightValue).dataType
    // backward tag order (right first at ties): the forward frame then
    // misses equal-time right rows, but backward captures them at
    // distance 0 and wins the tie anyway
    val leftTagged = left.select(
      col(key).as("__k"), col(leftTime).cast("long").as("__t"),
      lit(1).as("__src"),
      lit(null).cast(s"struct<v:${valueType.sql},t:bigint>").as("__v"),
      leftStruct.as("__row"))
    val rowType = leftTagged.schema("__row").dataType
    val rightTagged = right.select(
      col(key).as("__k"), col(rightTime).cast("long").as("__t"),
      lit(0).as("__src"),
      struct(col(rightValue).cast(valueType).as("v"),
        col(rightTime).cast("long").as("t")).as("__v"),
      lit(null).cast(rowType).as("__row"))
    val base = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__src"))
    val picked = leftTagged.unionByName(rightTagged)
      .withColumn("__b", last(col("__v"), ignoreNulls = true).over(
        base.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__f", first(col("__v"), ignoreNulls = true).over(
        base.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .filter(col("__src") === 1)
      .withColumn("__n",
        when(col("__f").isNull, col("__b"))
          .when(col("__b").isNull, col("__f"))
          .when(col("__t") - col("__b").getField("t") <=
            col("__f").getField("t") - col("__t"), col("__b"))
          .otherwise(col("__f")))
    val leftCols = left.columns.map(c => col("__row").getField(c).as(c))
    picked.select(leftCols.toIndexedSeq :+ col("__n").getField("v").as(outCol): _*)
  }

  private def asOf(left: DataFrame, right: DataFrame,
                   key: String, leftTime: String,
                   rightTime: String, rightValue: String,
                   outCol: String, forward: Boolean): DataFrame = {
    val leftStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val valueType = right.schema(rightValue).dataType
    // The carried value is wrapped in a presence struct: ignoreNulls must
    // skip the LEFT rows' sentinel, but a genuinely NULL right-side value
    // is still a match (DuckDB/pandas ASOF semantics) — so the null-ness
    // used by last()/first() is the wrapper's, never the value's.
    // Sort tags: backward wants right FIRST at equal __t (so it falls in
    // the preceding-inclusive frame); forward wants right LAST (so it
    // falls in the following-inclusive frame).
    val (leftTag, rightTag) = if (forward) (0, 1) else (1, 0)
    val leftTagged = left.select(
      col(key).as("__k"), col(leftTime).as("__t"), lit(leftTag).as("__src"),
      lit(null).cast(s"struct<v:${valueType.sql}>").as("__v"), leftStruct.as("__row"))
    val rowType = leftTagged.schema("__row").dataType
    val rightTagged = right.select(
      col(key).as("__k"), col(rightTime).as("__t"), lit(rightTag).as("__src"),
      struct(col(rightValue).cast(valueType).as("v")).as("__v"),
      lit(null).cast(rowType).as("__row"))

    val base = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__src"))
    val joined = leftTagged.unionByName(rightTagged)
      .withColumn("__asof",
        if (forward)
          first(col("__v"), ignoreNulls = true).over(
            base.rowsBetween(Window.currentRow, Window.unboundedFollowing))
        else
          last(col("__v"), ignoreNulls = true).over(
            base.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("__src") === leftTag)
    val leftCols = left.columns.map(c => col("__row").getField(c).as(c))
    joined.select(leftCols.toIndexedSeq :+ col("__asof").getField("v").as(outCol): _*)
  }
}
