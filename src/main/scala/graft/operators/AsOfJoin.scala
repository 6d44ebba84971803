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

  /** Left-as-of-join a single right value column onto `left`.
    * Output = left columns + `outCol` (null when no prior right row). */
  def lastValueAsOf(left: DataFrame, right: DataFrame,
                    key: String, leftTime: String,
                    rightTime: String, rightValue: String,
                    outCol: String): DataFrame = {
    val leftStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val valueType = right.schema(rightValue).dataType
    // The carried value is wrapped in a presence struct: ignoreNulls must
    // skip the LEFT rows' sentinel, but a genuinely NULL right-side value
    // is still a match (DuckDB/pandas ASOF semantics) — so the null-ness
    // used by last() is the wrapper's, never the value's.
    val leftTagged = left.select(
      col(key).as("__k"), col(leftTime).as("__t"), lit(1).as("__src"),
      lit(null).cast(s"struct<v:${valueType.sql}>").as("__v"), leftStruct.as("__row"))
    val rowType = leftTagged.schema("__row").dataType
    val rightTagged = right.select(
      col(key).as("__k"), col(rightTime).as("__t"), lit(0).as("__src"),
      struct(col(rightValue).cast(valueType).as("v")).as("__v"),
      lit(null).cast(rowType).as("__row"))

    // right (__src=0) sorts first at equal __t => inclusive as-of
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = leftTagged.unionByName(rightTagged)
      .withColumn("__asof", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__src") === 1)
    val leftCols = left.columns.map(c => col("__row").getField(c).as(c))
    joined.select(leftCols.toIndexedSeq :+ col("__asof").getField("v").as(outCol): _*)
  }
}
